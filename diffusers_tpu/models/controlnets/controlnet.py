"""ControlNetModel (SD/SDXL family).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/controlnets/controlnet.py:111`
ControlNetModel; conditioning embedding `:66`; forward residual emission
`:690-800`). Re-uses this framework's UNet down/mid blocks; the
zero-initialized 1x1 output convs are plain Conv2d leaves.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Linear, Module, ModuleList, Params, get_activation
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin
from ..unets.unet_2d_blocks import get_down_block
from ..unets.unet_2d_condition_blocks import UNetMidBlock2DCrossAttn


@dataclass
class ControlNetOutput(BaseOutput):
    down_block_res_samples: Tuple[jax.Array, ...]
    mid_block_res_sample: jax.Array


class ControlNetConditioningEmbedding(Module):
    def __init__(
        self,
        conditioning_embedding_channels: int,
        conditioning_channels: int = 3,
        block_out_channels: Tuple[int, ...] = (16, 32, 96, 256),
    ):
        super().__init__()
        self.conv_in = Conv2d(conditioning_channels, block_out_channels[0], kernel_size=3, padding=1)
        blocks = []
        for i in range(len(block_out_channels) - 1):
            blocks.append(Conv2d(block_out_channels[i], block_out_channels[i], kernel_size=3, padding=1))
            blocks.append(Conv2d(block_out_channels[i], block_out_channels[i + 1], kernel_size=3, padding=1, stride=2))
        self.blocks = ModuleList(blocks)
        self.conv_out = Conv2d(block_out_channels[-1], conditioning_embedding_channels, kernel_size=3, padding=1)

    def __call__(self, params: Params, conditioning: jax.Array) -> jax.Array:
        """conditioning: NHWC."""
        x = jax.nn.silu(self.conv_in(params["conv_in"], conditioning))
        for i, block in enumerate(self.blocks):
            x = jax.nn.silu(block(params["blocks"][i], x))
        return self.conv_out(params["conv_out"], x)


class ControlNetModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 4,
        conditioning_channels: int = 3,
        flip_sin_to_cos: bool = True,
        freq_shift: int = 0,
        down_block_types: Tuple[str, ...] = (
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "CrossAttnDownBlock2D",
            "DownBlock2D",
        ),
        mid_block_type: str = "UNetMidBlock2DCrossAttn",
        only_cross_attention: bool = False,
        block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280),
        layers_per_block: int = 2,
        downsample_padding: int = 1,
        mid_block_scale_factor: float = 1,
        act_fn: str = "silu",
        norm_num_groups: Optional[int] = 32,
        norm_eps: float = 1e-5,
        cross_attention_dim: int = 1280,
        transformer_layers_per_block: Union[int, Tuple[int, ...]] = 1,
        attention_head_dim: Union[int, Tuple[int, ...]] = 8,
        num_attention_heads: Optional[Union[int, Tuple[int, ...]]] = None,
        use_linear_projection: bool = False,
        class_embed_type: Optional[str] = None,
        addition_embed_type: Optional[str] = None,
        addition_time_embed_dim: Optional[int] = None,
        projection_class_embeddings_input_dim: Optional[int] = None,
        controlnet_conditioning_channel_order: str = "rgb",
        conditioning_embedding_out_channels: Tuple[int, ...] = (16, 32, 96, 256),
        global_pool_conditions: bool = False,
        addition_embed_type_num_heads: int = 64,
    ):
        super().__init__()
        num_attention_heads = num_attention_heads or attention_head_dim
        n_blocks = len(down_block_types)

        def per_block(v):
            return list(v) if isinstance(v, (list, tuple)) else [v] * n_blocks

        num_attention_heads_l = per_block(num_attention_heads)
        transformer_layers = per_block(transformer_layers_per_block)

        time_embed_dim = block_out_channels[0] * 4
        self.conv_in = Conv2d(in_channels, block_out_channels[0], kernel_size=3, padding=1)
        self.time_proj = Timesteps(block_out_channels[0], flip_sin_to_cos, freq_shift)
        self.time_embedding = TimestepEmbedding(block_out_channels[0], time_embed_dim, act_fn=act_fn)

        if addition_embed_type == "text_time":
            self.add_time_proj = Timesteps(addition_time_embed_dim, flip_sin_to_cos, freq_shift)
            self.add_embedding = TimestepEmbedding(projection_class_embeddings_input_dim, time_embed_dim)
        elif addition_embed_type is not None:
            raise NotImplementedError(f"addition_embed_type {addition_embed_type} not supported")

        self.controlnet_cond_embedding = ControlNetConditioningEmbedding(
            conditioning_embedding_channels=block_out_channels[0],
            conditioning_channels=conditioning_channels,
            block_out_channels=conditioning_embedding_out_channels,
        )

        down_blocks = []
        controlnet_down_blocks = [Conv2d(block_out_channels[0], block_out_channels[0], kernel_size=1, padding=0)]
        output_channel = block_out_channels[0]
        for i, down_block_type in enumerate(down_block_types):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            is_final_block = i == n_blocks - 1
            down_blocks.append(
                get_down_block(
                    down_block_type,
                    num_layers=layers_per_block,
                    transformer_layers_per_block=transformer_layers[i],
                    in_channels=input_channel,
                    out_channels=output_channel,
                    temb_channels=time_embed_dim,
                    add_downsample=not is_final_block,
                    resnet_eps=norm_eps,
                    resnet_act_fn=act_fn,
                    resnet_groups=norm_num_groups,
                    cross_attention_dim=cross_attention_dim,
                    num_attention_heads=num_attention_heads_l[i],
                    attention_head_dim=num_attention_heads_l[i],
                    downsample_padding=downsample_padding,
                    use_linear_projection=use_linear_projection,
                    only_cross_attention=only_cross_attention,
                )
            )
            for _ in range(layers_per_block):
                controlnet_down_blocks.append(Conv2d(output_channel, output_channel, kernel_size=1, padding=0))
            if not is_final_block:
                controlnet_down_blocks.append(Conv2d(output_channel, output_channel, kernel_size=1, padding=0))
        self.down_blocks = ModuleList(down_blocks)
        self.controlnet_down_blocks = ModuleList(controlnet_down_blocks)

        mid_block_channel = block_out_channels[-1]
        self.controlnet_mid_block = Conv2d(mid_block_channel, mid_block_channel, kernel_size=1, padding=0)
        self.mid_block = UNetMidBlock2DCrossAttn(
            transformer_layers_per_block=transformer_layers[-1],
            in_channels=mid_block_channel,
            temb_channels=time_embed_dim,
            resnet_eps=norm_eps,
            resnet_act_fn=act_fn,
            output_scale_factor=mid_block_scale_factor,
            cross_attention_dim=cross_attention_dim,
            num_attention_heads=num_attention_heads_l[-1],
            resnet_groups=norm_num_groups,
            use_linear_projection=use_linear_projection,
        )

    def __call__(
        self,
        params: Params,
        sample: jax.Array,  # [B, C, H, W]
        timestep,
        encoder_hidden_states: jax.Array,
        controlnet_cond: jax.Array,  # [B, 3, H*8, W*8]
        conditioning_scale: float = 1.0,
        added_cond_kwargs: Optional[dict] = None,
        guess_mode: bool = False,
        return_dict: bool = True,
    ):
        if self.config.controlnet_conditioning_channel_order == "bgr":
            controlnet_cond = jnp.flip(controlnet_cond, axis=1)

        timesteps = jnp.asarray(timestep)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = self.time_proj({}, timesteps).astype(sample.dtype)
        emb = self.time_embedding(params["time_embedding"], t_emb)

        if self.config.addition_embed_type == "text_time":
            text_embeds = added_cond_kwargs["text_embeds"]
            time_ids = added_cond_kwargs["time_ids"]
            time_embeds = self.add_time_proj({}, time_ids.reshape(-1)).reshape(text_embeds.shape[0], -1)
            add_embeds = jnp.concatenate([text_embeds, time_embeds], axis=-1).astype(sample.dtype)
            emb = emb + self.add_embedding(params["add_embedding"], add_embeds)

        sample = jnp.transpose(sample, (0, 2, 3, 1))
        sample = self.conv_in(params["conv_in"], sample)
        cond = jnp.transpose(controlnet_cond, (0, 2, 3, 1))
        cond_emb = self.controlnet_cond_embedding(params["controlnet_cond_embedding"], cond)
        sample = sample + cond_emb

        down_block_res_samples = (sample,)
        for i, block in enumerate(self.down_blocks):
            if getattr(block, "has_cross_attention", False):
                sample, res_samples = block(
                    params["down_blocks"][i], sample, temb=emb, encoder_hidden_states=encoder_hidden_states
                )
            else:
                sample, res_samples = block(params["down_blocks"][i], sample, temb=emb)
            down_block_res_samples += res_samples

        sample = self.mid_block(
            params["mid_block"], sample, temb=emb, encoder_hidden_states=encoder_hidden_states
        )

        controlnet_res = tuple(
            cb(params["controlnet_down_blocks"][i], r)
            for i, (r, cb) in enumerate(zip(down_block_res_samples, self.controlnet_down_blocks))
        )
        mid_res = self.controlnet_mid_block(params["controlnet_mid_block"], sample)

        if guess_mode and not self.config.global_pool_conditions:
            scales = jnp.logspace(-1, 0, len(controlnet_res) + 1) * conditioning_scale
            controlnet_res = tuple(r * s for r, s in zip(controlnet_res, scales[:-1]))
            mid_res = mid_res * scales[-1]
        else:
            controlnet_res = tuple(r * conditioning_scale for r in controlnet_res)
            mid_res = mid_res * conditioning_scale

        if self.config.global_pool_conditions:
            controlnet_res = tuple(jnp.mean(r, axis=(1, 2), keepdims=True) for r in controlnet_res)
            mid_res = jnp.mean(mid_res, axis=(1, 2), keepdims=True)

        # NHWC -> NCHW for the public residual contract
        controlnet_res = tuple(jnp.transpose(r, (0, 3, 1, 2)) for r in controlnet_res)
        mid_res = jnp.transpose(mid_res, (0, 3, 1, 2))

        if not return_dict:
            return (controlnet_res, mid_res)
        return ControlNetOutput(down_block_res_samples=controlnet_res, mid_block_res_sample=mid_res)
