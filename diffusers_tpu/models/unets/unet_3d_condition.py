"""UNet3DConditionModel — the text-to-video-synthesis (ModelScope/zeroscope)
video UNet.

TPU-native counterpart of the reference
(`/root/reference/src/diffusers/models/unets/unet_3d_condition.py:58`):
frames fold into the batch axis as ``[B*F, H, W, C]`` NHWC; the temporal
convs/attentions reshape per-layer (NDHWC conv, per-pixel frame-sequence
attention). The time/text conditioning repeats per frame before the block
stack, exactly mirroring the reference's `repeat_interleave` (`:570-573`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, GroupNorm, Module, ModuleList, Params
from ...utils import BaseOutput
from ...ops.module import get_activation
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin
from ..transformers.transformer_temporal import TransformerTemporalModel
from .unet_3d_blocks import UNetMidBlock3DCrossAttn, get_down_block_3d, get_up_block_3d


@dataclass
class UNet3DConditionOutput(BaseOutput):
    sample: jax.Array  # [B, C, F, H, W]


class UNet3DConditionModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        sample_size: Optional[int] = None,
        in_channels: int = 4,
        out_channels: int = 4,
        down_block_types: Tuple[str, ...] = (
            "CrossAttnDownBlock3D", "CrossAttnDownBlock3D", "CrossAttnDownBlock3D", "DownBlock3D",
        ),
        up_block_types: Tuple[str, ...] = (
            "UpBlock3D", "CrossAttnUpBlock3D", "CrossAttnUpBlock3D", "CrossAttnUpBlock3D",
        ),
        block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
        layers_per_block: int = 2,
        downsample_padding: int = 1,
        act_fn: str = "silu",
        norm_num_groups: Optional[int] = 32,
        norm_eps: float = 1e-5,
        cross_attention_dim: int = 1024,
        attention_head_dim: Union[int, Tuple[int, ...]] = 64,
        time_cond_proj_dim: Optional[int] = None,
    ):
        super().__init__()
        # reference naming quirk (unet_3d_condition.py:143): attention_head_dim
        # here is the PER-HEAD dim; blocks derive the head count from channels
        heads = attention_head_dim
        if isinstance(heads, int):
            heads = (heads,) * len(down_block_types)

        time_embed_dim = block_out_channels[0] * 4
        self.conv_in = Conv2d(in_channels, block_out_channels[0], kernel_size=3, padding=1)
        self.time_proj = Timesteps(block_out_channels[0], flip_sin_to_cos=True, downscale_freq_shift=0)
        self.time_embedding = TimestepEmbedding(block_out_channels[0], time_embed_dim,
                                                cond_proj_dim=time_cond_proj_dim)
        # reference `:181`: 8 heads x the config head dim (inner != in_channels)
        self.transformer_in = TransformerTemporalModel(
            num_attention_heads=8,
            attention_head_dim=heads[0],
            in_channels=block_out_channels[0],
            num_layers=1,
            norm_num_groups=norm_num_groups,
        )

        down_blocks, up_blocks = [], []
        output_channel = block_out_channels[0]
        for i, block_type in enumerate(down_block_types):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            is_final = i == len(block_out_channels) - 1
            down_blocks.append(get_down_block_3d(
                block_type,
                in_channels=input_channel, out_channels=output_channel,
                temb_channels=time_embed_dim, num_layers=layers_per_block,
                resnet_eps=norm_eps, resnet_groups=norm_num_groups,
                num_attention_heads=heads[i], cross_attention_dim=cross_attention_dim,
                downsample_padding=downsample_padding, add_downsample=not is_final,
                use_linear_projection=True,
            ))
        self.down_blocks = ModuleList(down_blocks)

        self.mid_block = UNetMidBlock3DCrossAttn(
            in_channels=block_out_channels[-1], temb_channels=time_embed_dim,
            resnet_eps=norm_eps, resnet_groups=norm_num_groups,
            num_attention_heads=heads[-1], cross_attention_dim=cross_attention_dim,
            use_linear_projection=True,
        )

        reversed_channels = list(reversed(block_out_channels))
        reversed_heads = list(reversed(heads))
        output_channel = reversed_channels[0]
        for i, block_type in enumerate(up_block_types):
            prev_output_channel = output_channel
            output_channel = reversed_channels[i]
            input_channel = reversed_channels[min(i + 1, len(block_out_channels) - 1)]
            is_final = i == len(block_out_channels) - 1
            up_blocks.append(get_up_block_3d(
                block_type,
                in_channels=input_channel, out_channels=output_channel,
                prev_output_channel=prev_output_channel,
                temb_channels=time_embed_dim, num_layers=layers_per_block + 1,
                resnet_eps=norm_eps, resnet_groups=norm_num_groups,
                num_attention_heads=reversed_heads[i], cross_attention_dim=cross_attention_dim,
                add_upsample=not is_final,
                use_linear_projection=True,
            ))
        self.up_blocks = ModuleList(up_blocks)

        self.conv_norm_out = GroupNorm(num_groups=norm_num_groups, num_channels=block_out_channels[0],
                                       eps=norm_eps)
        self.conv_act = get_activation(act_fn)
        self.conv_out = Conv2d(block_out_channels[0], out_channels, kernel_size=3, padding=1)

    def __call__(
        self,
        params: Params,
        sample: jax.Array,  # [B, C, F, H, W]
        timestep: Union[jax.Array, float, int],
        encoder_hidden_states: jax.Array,  # [B, S, D]
        timestep_cond: Optional[jax.Array] = None,
        return_dict: bool = True,
    ) -> Union[UNet3DConditionOutput, tuple]:
        b, c, num_frames, h, w = sample.shape

        timesteps = jnp.asarray(timestep)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (b,))
        t_emb = self.time_proj({}, timesteps).astype(sample.dtype)
        emb = self.time_embedding(params["time_embedding"], t_emb, timestep_cond)
        # per-frame conditioning (reference `:570-573` repeat_interleave)
        emb = jnp.repeat(emb, num_frames, axis=0)
        encoder_hidden_states = jnp.repeat(encoder_hidden_states, num_frames, axis=0)

        # [B, C, F, H, W] -> [B*F, H, W, C]
        x = jnp.transpose(sample, (0, 2, 3, 4, 1)).reshape(b * num_frames, h, w, c)
        x = self.conv_in(params["conv_in"], x)
        x = self.transformer_in(params["transformer_in"], x, num_frames=num_frames)

        res_samples = (x,)
        for i, block in enumerate(self.down_blocks):
            if block.has_cross_attention:
                x, res = block(params["down_blocks"][i], x, emb, encoder_hidden_states, num_frames)
            else:
                x, res = block(params["down_blocks"][i], x, emb, num_frames=num_frames)
            res_samples += res

        x = self.mid_block(params["mid_block"], x, emb, encoder_hidden_states, num_frames)

        for i, block in enumerate(self.up_blocks):
            skips = res_samples[-len(block.resnets):]
            res_samples = res_samples[: -len(block.resnets)]
            if block.has_cross_attention:
                x = block(params["up_blocks"][i], x, skips, emb, encoder_hidden_states, num_frames)
            else:
                x = block(params["up_blocks"][i], x, skips, emb, num_frames=num_frames)

        x = self.conv_norm_out(params["conv_norm_out"], x)
        x = self.conv_act(x)
        x = self.conv_out(params["conv_out"], x)

        # [B*F, H, W, C] -> [B, C, F, H, W]
        x = x.reshape(b, num_frames, *x.shape[1:])
        output = jnp.transpose(x, (0, 4, 1, 2, 3))
        if not return_dict:
            return (output,)
        return UNet3DConditionOutput(sample=output)
