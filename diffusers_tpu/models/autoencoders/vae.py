"""VAE Encoder/Decoder blocks + DiagonalGaussianDistribution.

Behavioral mirror of the reference `models/autoencoders/vae.py`
(Encoder `:59`, Decoder `:180`, DiagonalGaussianDistribution `:687`) and the
DownEncoderBlock2D/UpDecoderBlock2D blocks from `unet_2d_blocks.py`.
NHWC internals.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.module import Conv2d, GroupNorm, Module, ModuleList, Params, get_activation
from ...utils import BaseOutput
from ...utils.jax_utils import randn_tensor
from ..resnet import Downsample2D, ResnetBlock2D, Upsample2D
from ..unets.unet_2d_blocks import UNetMidBlock2D


@dataclass
class DecoderOutput(BaseOutput):
    sample: jax.Array
    commit_loss: Optional[jax.Array] = None


class DownEncoderBlock2D(Module):
    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        num_layers: int = 1,
        resnet_eps: float = 1e-6,
        resnet_act_fn: str = "swish",
        resnet_groups: int = 32,
        output_scale_factor: float = 1.0,
        add_downsample: bool = True,
        downsample_padding: int = 1,
    ):
        super().__init__()
        self.resnets = ModuleList(
            [
                ResnetBlock2D(
                    in_channels=in_channels if i == 0 else out_channels,
                    out_channels=out_channels,
                    temb_channels=None,
                    eps=resnet_eps,
                    groups=resnet_groups,
                    non_linearity=resnet_act_fn,
                    output_scale_factor=output_scale_factor,
                )
                for i in range(num_layers)
            ]
        )
        self.add_downsample = add_downsample
        if add_downsample:
            self.downsamplers = ModuleList(
                [Downsample2D(out_channels, use_conv=True, out_channels=out_channels, padding=downsample_padding)]
            )

    def __call__(self, params: Params, hidden_states: jax.Array) -> jax.Array:
        for i, resnet in enumerate(self.resnets):
            hidden_states = resnet(params["resnets"][i], hidden_states, temb=None)
        if self.add_downsample:
            hidden_states = self.downsamplers[0](params["downsamplers"][0], hidden_states)
        return hidden_states


class UpDecoderBlock2D(Module):
    def __init__(
        self,
        in_channels: int,
        out_channels: int,
        num_layers: int = 1,
        resnet_eps: float = 1e-6,
        resnet_act_fn: str = "swish",
        resnet_groups: int = 32,
        output_scale_factor: float = 1.0,
        add_upsample: bool = True,
        temb_channels: Optional[int] = None,
        resnet_time_scale_shift: str = "default",
    ):
        super().__init__()
        self.resnets = ModuleList(
            [
                ResnetBlock2D(
                    in_channels=in_channels if i == 0 else out_channels,
                    out_channels=out_channels,
                    temb_channels=temb_channels,
                    eps=resnet_eps,
                    groups=resnet_groups,
                    non_linearity=resnet_act_fn,
                    output_scale_factor=output_scale_factor,
                    time_embedding_norm=resnet_time_scale_shift,
                )
                for i in range(num_layers)
            ]
        )
        self.add_upsample = add_upsample
        if add_upsample:
            self.upsamplers = ModuleList([Upsample2D(out_channels, use_conv=True, out_channels=out_channels)])

    def __call__(self, params: Params, hidden_states: jax.Array, temb: Optional[jax.Array] = None) -> jax.Array:
        for i, resnet in enumerate(self.resnets):
            hidden_states = resnet(params["resnets"][i], hidden_states, temb=temb)
        if self.add_upsample:
            hidden_states = self.upsamplers[0](params["upsamplers"][0], hidden_states)
        return hidden_states


class Encoder(Module):
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        down_block_types: Tuple[str, ...] = ("DownEncoderBlock2D",),
        block_out_channels: Tuple[int, ...] = (64,),
        layers_per_block: int = 2,
        norm_num_groups: int = 32,
        act_fn: str = "silu",
        double_z: bool = True,
        mid_block_add_attention: bool = True,
    ):
        super().__init__()
        self.conv_in = Conv2d(in_channels, block_out_channels[0], kernel_size=3, stride=1, padding=1)

        down_blocks = []
        output_channel = block_out_channels[0]
        for i, down_block_type in enumerate(down_block_types):
            if down_block_type != "DownEncoderBlock2D":
                raise NotImplementedError(f"down_block_type {down_block_type} not yet supported in VAE encoder")
            input_channel = output_channel
            output_channel = block_out_channels[i]
            is_final_block = i == len(block_out_channels) - 1
            down_blocks.append(
                DownEncoderBlock2D(
                    num_layers=layers_per_block,
                    in_channels=input_channel,
                    out_channels=output_channel,
                    add_downsample=not is_final_block,
                    resnet_eps=1e-6,
                    downsample_padding=0,
                    resnet_act_fn=act_fn,
                    resnet_groups=norm_num_groups,
                )
            )
        self.down_blocks = ModuleList(down_blocks)

        self.mid_block = UNetMidBlock2D(
            in_channels=block_out_channels[-1],
            temb_channels=None,
            resnet_eps=1e-6,
            resnet_act_fn=act_fn,
            output_scale_factor=1,
            attention_head_dim=block_out_channels[-1],
            resnet_groups=norm_num_groups,
            add_attention=mid_block_add_attention,
        )

        self.conv_norm_out = GroupNorm(num_channels=block_out_channels[-1], num_groups=norm_num_groups, eps=1e-6)
        self.conv_act = get_activation("silu")
        conv_out_channels = 2 * out_channels if double_z else out_channels
        self.conv_out = Conv2d(block_out_channels[-1], conv_out_channels, kernel_size=3, padding=1)

    def __call__(self, params: Params, sample: jax.Array) -> jax.Array:
        """sample: NHWC."""
        sample = self.conv_in(params["conv_in"], sample)
        for i, block in enumerate(self.down_blocks):
            sample = block(params["down_blocks"][i], sample)
        sample = self.mid_block(params["mid_block"], sample, None)
        sample = self.conv_norm_out(params["conv_norm_out"], sample)
        sample = self.conv_act(sample)
        return self.conv_out(params["conv_out"], sample)


class Decoder(Module):
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        up_block_types: Tuple[str, ...] = ("UpDecoderBlock2D",),
        block_out_channels: Tuple[int, ...] = (64,),
        layers_per_block: int = 2,
        norm_num_groups: int = 32,
        act_fn: str = "silu",
        mid_block_add_attention: bool = True,
    ):
        super().__init__()
        self.conv_in = Conv2d(in_channels, block_out_channels[-1], kernel_size=3, stride=1, padding=1)

        self.mid_block = UNetMidBlock2D(
            in_channels=block_out_channels[-1],
            temb_channels=None,
            resnet_eps=1e-6,
            resnet_act_fn=act_fn,
            output_scale_factor=1,
            attention_head_dim=block_out_channels[-1],
            resnet_groups=norm_num_groups,
            add_attention=mid_block_add_attention,
        )

        up_blocks = []
        reversed_block_out_channels = list(reversed(block_out_channels))
        output_channel = reversed_block_out_channels[0]
        for i, up_block_type in enumerate(up_block_types):
            if up_block_type != "UpDecoderBlock2D":
                raise NotImplementedError(f"up_block_type {up_block_type} not yet supported in VAE decoder")
            prev_output_channel = output_channel
            output_channel = reversed_block_out_channels[i]
            is_final_block = i == len(block_out_channels) - 1
            up_blocks.append(
                UpDecoderBlock2D(
                    num_layers=layers_per_block + 1,
                    in_channels=prev_output_channel,
                    out_channels=output_channel,
                    add_upsample=not is_final_block,
                    resnet_eps=1e-6,
                    resnet_act_fn=act_fn,
                    resnet_groups=norm_num_groups,
                )
            )
        self.up_blocks = ModuleList(up_blocks)

        self.conv_norm_out = GroupNorm(num_channels=block_out_channels[0], num_groups=norm_num_groups, eps=1e-6)
        self.conv_act = get_activation("silu")
        self.conv_out = Conv2d(block_out_channels[0], out_channels, kernel_size=3, padding=1)

    def __call__(self, params: Params, sample: jax.Array) -> jax.Array:
        sample = self.conv_in(params["conv_in"], sample)
        sample = self.mid_block(params["mid_block"], sample, None)
        for i, block in enumerate(self.up_blocks):
            sample = block(params["up_blocks"][i], sample)
        sample = self.conv_norm_out(params["conv_norm_out"], sample)
        sample = self.conv_act(sample)
        return self.conv_out(params["conv_out"], sample)


class DiagonalGaussianDistribution:
    """Latent distribution over NCHW moments (mean‖logvar on channel axis)."""

    def __init__(self, parameters: jax.Array, deterministic: bool = False):
        self.parameters = parameters
        self.mean, self.logvar = jnp.split(parameters, 2, axis=1)
        self.logvar = jnp.clip(self.logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        if self.deterministic:
            return self.mean
        noise = randn_tensor(self.mean.shape, key=key, dtype=self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussianDistribution"] = None) -> jax.Array:
        if self.deterministic:
            return jnp.array([0.0])
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=axes)
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other.mean) / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        import math

        if self.deterministic:
            return jnp.array([0.0])
        logtwopi = math.log(2.0 * math.pi)
        axes = tuple(range(1, self.mean.ndim))
        return 0.5 * jnp.sum(logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var, axis=axes)
