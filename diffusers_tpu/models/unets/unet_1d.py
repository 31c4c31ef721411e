"""UNet1DModel — dance-diffusion audio UNet + RL planner/value nets.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/unets/unet_1d.py:40`; forward
`:205-265`): Gaussian-Fourier or positional time embedding, optionally
broadcast across the sequence as extra channels (dance diffusion) or MLP'd
(RL planner), a down/mid/up block stack, and an optional out block.

TPU-first: activations are NLC internally (channels minor); the public API
speaks NCL for reference parity. The whole model is a pure function of a
param pytree — jit/pjit/grad-ready.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...utils import BaseOutput
from ...ops.module import Module, ModuleList, Params
from ..embeddings import GaussianFourierProjection, TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin
from .unet_1d_blocks import get_down_block, get_mid_block, get_out_block, get_up_block


@dataclass
class UNet1DOutput(BaseOutput):
    sample: jax.Array


class UNet1DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        sample_size: int = 65536,
        sample_rate: Optional[int] = None,
        in_channels: int = 2,
        out_channels: int = 2,
        extra_in_channels: int = 0,
        time_embedding_type: str = "fourier",
        time_embedding_dim: Optional[int] = None,
        flip_sin_to_cos: bool = True,
        use_timestep_embedding: bool = False,
        freq_shift: float = 0.0,
        down_block_types: Tuple[str, ...] = ("DownBlock1DNoSkip", "DownBlock1D", "AttnDownBlock1D"),
        up_block_types: Tuple[str, ...] = ("AttnUpBlock1D", "UpBlock1D", "UpBlock1DNoSkip"),
        mid_block_type: str = "UNetMidBlock1D",
        out_block_type: Optional[str] = None,
        block_out_channels: Tuple[int, ...] = (32, 32, 64),
        act_fn: Optional[str] = None,
        norm_num_groups: int = 8,
        layers_per_block: int = 1,
        downsample_each_block: bool = False,
    ):
        super().__init__()
        self.sample_size = sample_size

        # time (reference unet_1d.py:101-128)
        if time_embedding_type == "fourier":
            time_embed_dim = time_embedding_dim or block_out_channels[0] * 2
            if time_embed_dim % 2 != 0:
                raise ValueError(f"`time_embed_dim` should be divisible by 2, but is {time_embed_dim}.")
            self.time_proj = GaussianFourierProjection(
                embedding_size=time_embed_dim // 2, log=False, flip_sin_to_cos=flip_sin_to_cos)
            timestep_input_dim = time_embed_dim
        elif time_embedding_type == "positional":
            time_embed_dim = time_embedding_dim or block_out_channels[0] * 4
            self.time_proj = Timesteps(block_out_channels[0], flip_sin_to_cos, freq_shift)
            timestep_input_dim = block_out_channels[0]
        else:
            raise ValueError(f"unknown time_embedding_type {time_embedding_type}")

        if use_timestep_embedding:
            time_embed_dim = block_out_channels[0] * 4
            self.time_mlp = TimestepEmbedding(
                timestep_input_dim, time_embed_dim, act_fn=act_fn or "silu",
                out_dim=block_out_channels[0])

        # down
        down_blocks = []
        output_channel = in_channels
        for i, down_block_type in enumerate(down_block_types):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            if i == 0:
                input_channel += extra_in_channels
            is_final_block = i == len(block_out_channels) - 1
            down_blocks.append(get_down_block(
                down_block_type, num_layers=layers_per_block, in_channels=input_channel,
                out_channels=output_channel, temb_channels=block_out_channels[0],
                add_downsample=not is_final_block or downsample_each_block))
        self.down_blocks = ModuleList(down_blocks)

        # mid
        self.mid_block = get_mid_block(
            mid_block_type, in_channels=block_out_channels[-1], mid_channels=block_out_channels[-1],
            out_channels=block_out_channels[-1], embed_dim=block_out_channels[0],
            num_layers=layers_per_block, add_downsample=downsample_each_block)

        # up
        reversed_block_out_channels = list(reversed(block_out_channels))
        output_channel = reversed_block_out_channels[0]
        final_upsample_channels = out_channels if out_block_type is None else block_out_channels[0]
        up_blocks = []
        for i, up_block_type in enumerate(up_block_types):
            prev_output_channel = output_channel
            output_channel = (reversed_block_out_channels[i + 1]
                              if i < len(up_block_types) - 1 else final_upsample_channels)
            is_final_block = i == len(block_out_channels) - 1
            up_blocks.append(get_up_block(
                up_block_type, num_layers=layers_per_block, in_channels=prev_output_channel,
                out_channels=output_channel, temb_channels=block_out_channels[0],
                add_upsample=not is_final_block))
        self.up_blocks = ModuleList(up_blocks)

        # out
        num_groups_out = norm_num_groups if norm_num_groups is not None else min(block_out_channels[0] // 4, 32)
        self.out_block = get_out_block(
            out_block_type=out_block_type, num_groups_out=num_groups_out,
            embed_dim=block_out_channels[0], out_channels=out_channels, act_fn=act_fn,
            fc_dim=block_out_channels[-1] // 4)

    def init_params(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return self.init(key, dtype=dtype)

    def __call__(self, params: Params, sample: jax.Array, timestep, return_dict: bool = True):
        """sample: [B, C, L] (NCL, reference layout)."""
        x = jnp.transpose(sample, (0, 2, 1))  # -> NLC

        timesteps = jnp.asarray(timestep)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))
        temb = self.time_proj({} if "time_proj" not in params else params["time_proj"],
                              timesteps).astype(x.dtype)
        if self.config.use_timestep_embedding:
            temb = self.time_mlp(params["time_mlp"], temb)
        else:
            # broadcast across the sequence as channels (reference :238-240)
            temb = jnp.broadcast_to(temb[:, None, :], (x.shape[0], x.shape[1], temb.shape[-1]))

        res_samples = ()
        for i, block in enumerate(self.down_blocks):
            x, rs = block(params["down_blocks"][i], x, temb)
            res_samples += rs

        if self.mid_block is not None:
            x = self.mid_block(params["mid_block"], x, temb)

        for i, block in enumerate(self.up_blocks):
            x = block(params["up_blocks"][i], x, res_samples[-1:], temb)
            res_samples = res_samples[:-1]

        if self.out_block is not None:
            x = self.out_block(params["out_block"], x, temb)

        if x.ndim == 3:
            x = jnp.transpose(x, (0, 2, 1))  # -> NCL
        if not return_dict:
            return (x,)
        return UNet1DOutput(sample=x)
