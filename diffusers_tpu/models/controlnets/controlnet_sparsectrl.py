"""SparseCtrl — sparse-frame-conditioned ControlNet for AnimateDiff.

TPU-native counterpart of the reference
(`/root/reference/src/diffusers/models/controlnets/controlnet_sparsectrl.py:97`,
SparseCtrl paper arXiv:2311.16933): motion down blocks over a ZEROED sample
(only the conditioning drives the residuals), conditioning frames +
validity-mask concat through a (simplified: single zero conv) embedding,
zero-init per-resolution residual convs. Frames fold into the batch as NHWC
like every video model here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Module, ModuleList, Params
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin
from ..unets.unet_2d_condition_blocks import UNetMidBlock2DCrossAttn
from ..unets.unet_motion_model import CrossAttnDownBlockMotion, DownBlockMotion
from .controlnet import ControlNetConditioningEmbedding
from .controlnet_flux import _zero_tree


@dataclass
class SparseControlNetOutput(BaseOutput):
    down_block_res_samples: Tuple[jax.Array, ...]
    mid_block_res_sample: jax.Array


class SparseControlNetModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 4,
        conditioning_channels: int = 4,
        flip_sin_to_cos: bool = True,
        freq_shift: int = 0,
        down_block_types: Tuple[str, ...] = (
            "CrossAttnDownBlockMotion", "CrossAttnDownBlockMotion",
            "CrossAttnDownBlockMotion", "DownBlockMotion",
        ),
        only_cross_attention: Union[bool, Tuple[bool, ...]] = False,
        block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
        layers_per_block: int = 2,
        downsample_padding: int = 1,
        mid_block_scale_factor: float = 1,
        act_fn: str = "silu",
        norm_num_groups: Optional[int] = 32,
        norm_eps: float = 1e-5,
        cross_attention_dim: int = 768,
        transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
        transformer_layers_per_mid_block: Optional[Union[int, Tuple[int, ...]]] = None,
        temporal_transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
        attention_head_dim: Union[int, Tuple[int, ...]] = 8,
        num_attention_heads: Optional[Union[int, Tuple[int, ...]]] = None,
        use_linear_projection: bool = False,
        upcast_attention: bool = False,
        resnet_time_scale_shift: str = "default",
        conditioning_embedding_out_channels: Optional[Tuple[int, ...]] = (16, 32, 96, 256),
        global_pool_conditions: bool = False,
        controlnet_conditioning_channel_order: str = "rgb",
        motion_max_seq_length: int = 32,
        motion_num_attention_heads: int = 8,
        concat_conditioning_mask: bool = True,
        use_simplified_condition_embedding: bool = True,
    ):
        super().__init__()
        heads = num_attention_heads or attention_head_dim
        if isinstance(heads, int):
            heads = (heads,) * len(down_block_types)
        if isinstance(cross_attention_dim, int):
            cross_attention_dim = (cross_attention_dim,) * len(down_block_types)
        if isinstance(transformer_layers_per_block, int):
            transformer_layers_per_block = (transformer_layers_per_block,) * len(down_block_types)
        if isinstance(temporal_transformer_layers_per_block, int):
            temporal_transformer_layers_per_block = (
                temporal_transformer_layers_per_block,
            ) * len(down_block_types)
        if isinstance(only_cross_attention, bool):
            only_cross_attention = (only_cross_attention,) * len(down_block_types)
        if isinstance(motion_num_attention_heads, int):
            motion_num_attention_heads = (motion_num_attention_heads,) * len(down_block_types)
        self.use_simplified_condition_embedding = use_simplified_condition_embedding
        self.concat_conditioning_mask = concat_conditioning_mask

        self.conv_in = Conv2d(in_channels, block_out_channels[0], kernel_size=3, padding=1)
        cond_channels = conditioning_channels + (1 if concat_conditioning_mask else 0)
        if use_simplified_condition_embedding:
            self.controlnet_cond_embedding = Conv2d(cond_channels, block_out_channels[0],
                                                    kernel_size=3, padding=1)
        else:
            self.controlnet_cond_embedding = ControlNetConditioningEmbedding(
                conditioning_embedding_channels=block_out_channels[0],
                block_out_channels=conditioning_embedding_out_channels,
                conditioning_channels=cond_channels,
            )

        time_embed_dim = block_out_channels[0] * 4
        self.time_proj = Timesteps(block_out_channels[0], flip_sin_to_cos, freq_shift)
        self.time_embedding = TimestepEmbedding(block_out_channels[0], time_embed_dim, act_fn=act_fn)

        down_blocks, controlnet_down_blocks = [], []
        output_channel = block_out_channels[0]
        controlnet_down_blocks.append(Conv2d(output_channel, output_channel, kernel_size=1))
        for i, block_type in enumerate(down_block_types):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            is_final = i == len(block_out_channels) - 1
            common = dict(
                in_channels=input_channel, out_channels=output_channel,
                temb_channels=time_embed_dim, num_layers=layers_per_block,
                resnet_eps=norm_eps, resnet_time_scale_shift=resnet_time_scale_shift,
                resnet_act_fn=act_fn, resnet_groups=norm_num_groups,
                add_downsample=not is_final,
                temporal_num_attention_heads=motion_num_attention_heads[i],
                temporal_max_seq_length=motion_max_seq_length,
                temporal_transformer_layers_per_block=temporal_transformer_layers_per_block[i],
                temporal_double_self_attention=False,
            )
            if block_type == "CrossAttnDownBlockMotion":
                down_blocks.append(CrossAttnDownBlockMotion(
                    transformer_layers_per_block=transformer_layers_per_block[i],
                    num_attention_heads=heads[i], cross_attention_dim=cross_attention_dim[i],
                    use_linear_projection=use_linear_projection,
                    only_cross_attention=only_cross_attention[i], **common,
                ))
            elif block_type == "DownBlockMotion":
                down_blocks.append(DownBlockMotion(**common))
            else:
                raise ValueError(f"invalid SparseCtrl down block {block_type}")
            for _ in range(layers_per_block):
                controlnet_down_blocks.append(Conv2d(output_channel, output_channel, kernel_size=1))
            if not is_final:
                controlnet_down_blocks.append(Conv2d(output_channel, output_channel, kernel_size=1))
        self.down_blocks = ModuleList(down_blocks)
        self.controlnet_down_blocks = ModuleList(controlnet_down_blocks)

        mid_channels = block_out_channels[-1]
        self.controlnet_mid_block = Conv2d(mid_channels, mid_channels, kernel_size=1)
        if transformer_layers_per_mid_block is None:
            transformer_layers_per_mid_block = transformer_layers_per_block[-1]
        self.mid_block = UNetMidBlock2DCrossAttn(
            in_channels=mid_channels, temb_channels=time_embed_dim, num_layers=1,
            transformer_layers_per_block=transformer_layers_per_mid_block,
            resnet_eps=norm_eps, resnet_time_scale_shift=resnet_time_scale_shift,
            resnet_act_fn=act_fn, resnet_groups=norm_num_groups,
            num_attention_heads=heads[-1], output_scale_factor=mid_block_scale_factor,
            cross_attention_dim=cross_attention_dim[-1],
            use_linear_projection=use_linear_projection,
        )

    def init_params(self, key: Optional[jax.Array] = None, dtype=jnp.float32) -> Params:
        params = super().init_params(key, dtype=dtype)
        params["controlnet_down_blocks"] = _zero_tree(params["controlnet_down_blocks"])
        params["controlnet_mid_block"] = _zero_tree(params["controlnet_mid_block"])
        if self.use_simplified_condition_embedding:
            params["controlnet_cond_embedding"] = _zero_tree(params["controlnet_cond_embedding"])
        return params

    def __call__(
        self,
        params: Params,
        sample: jax.Array,  # [B, C, F, H, W] — zeroed internally (reference `:607`)
        timestep: Union[jax.Array, float, int],
        encoder_hidden_states: jax.Array,  # [B*F, S, D] (per-frame) or [B, S, D]
        controlnet_cond: jax.Array,  # [B, C_cond, F, H, W]
        conditioning_scale: float = 1.0,
        conditioning_mask: Optional[jax.Array] = None,  # [B, 1, F, H, W]
        guess_mode: bool = False,
        return_dict: bool = True,
    ) -> Union[SparseControlNetOutput, tuple]:
        b, c, num_frames, h, w = sample.shape
        # SparseCtrl zeroes the sample: only conditioning drives residuals
        sample = jnp.zeros_like(sample)

        if self.config.controlnet_conditioning_channel_order == "bgr":
            controlnet_cond = jnp.flip(controlnet_cond, axis=1)

        timesteps = jnp.asarray(timestep)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (b,))
        t_emb = self.time_proj({}, timesteps).astype(sample.dtype)
        emb = self.time_embedding(params["time_embedding"], t_emb)
        emb = jnp.repeat(emb, num_frames, axis=0)
        if encoder_hidden_states.shape[0] == b and num_frames > 1:
            encoder_hidden_states = jnp.repeat(encoder_hidden_states, num_frames, axis=0)

        x = jnp.transpose(sample, (0, 2, 3, 4, 1)).reshape(b * num_frames, h, w, c)
        x = self.conv_in(params["conv_in"], x)

        if self.concat_conditioning_mask:
            controlnet_cond = jnp.concatenate([controlnet_cond, conditioning_mask], axis=1)
        cc = jnp.transpose(controlnet_cond, (0, 2, 3, 4, 1))
        cc = cc.reshape(b * num_frames, h, w, cc.shape[-1])
        cond = self.controlnet_cond_embedding(params["controlnet_cond_embedding"], cc)
        x = x + cond

        down_block_res_samples = (x,)
        for i, block in enumerate(self.down_blocks):
            if block.has_cross_attention:
                x, res = block(params["down_blocks"][i], x, emb, encoder_hidden_states,
                               num_frames=num_frames)
            else:
                x, res = block(params["down_blocks"][i], x, emb, num_frames=num_frames)
            down_block_res_samples += res

        x = self.mid_block(params["mid_block"], x, emb, encoder_hidden_states=encoder_hidden_states)

        controlnet_res = tuple(
            self.controlnet_down_blocks[i](params["controlnet_down_blocks"][i], s)
            for i, s in enumerate(down_block_res_samples)
        )
        mid_res = self.controlnet_mid_block(params["controlnet_mid_block"], x)

        if guess_mode and not self.config.global_pool_conditions:
            scales = jnp.logspace(-1, 0, len(controlnet_res) + 1) * conditioning_scale
            controlnet_res = tuple(s * scales[i] for i, s in enumerate(controlnet_res))
            mid_res = mid_res * scales[-1]
        else:
            controlnet_res = tuple(s * conditioning_scale for s in controlnet_res)
            mid_res = mid_res * conditioning_scale

        if self.config.global_pool_conditions:
            controlnet_res = tuple(jnp.mean(s, axis=(1, 2), keepdims=True) for s in controlnet_res)
            mid_res = jnp.mean(mid_res, axis=(1, 2), keepdims=True)

        if not return_dict:
            return (controlnet_res, mid_res)
        return SparseControlNetOutput(down_block_res_samples=controlnet_res,
                                      mid_block_res_sample=mid_res)
