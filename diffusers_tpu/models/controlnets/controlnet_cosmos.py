"""Cosmos Transfer2.5 ControlNet.

Behavioral mirror of the reference `CosmosControlNetModel`
(`/root/reference/src/diffusers/models/controlnets/controlnet_cosmos.py:39`):
duplicates the transformer's embedding stack (patch_embed for control latents,
patch_embed_base for base latents, time_embed, optional learnable pos-embed,
optional text/image context projections) and runs `n_controlnet_blocks`
CosmosTransformerBlocks where block 0 carries a ``before_proj`` merging the
control stream into the base stream and every block emits an ``after_proj``
residual, scaled by ``conditioning_scale`` and consumed by
`CosmosTransformer3DModel(block_controlnet_hidden_states=...)` every
``controlnet_block_every_n`` blocks.

TPU-first: pure-pytree modules; the padding-mask NEAREST resize uses
`jax.image.resize` instead of torchvision (reference `:201`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...utils import BaseOutput
from ...ops.module import Linear, Module, ModuleList, Params
from ..modeling_utils import ModelMixin
from ..transformers.transformer_cosmos import (
    CosmosTransformerBlock,
    _CosmosEmbedding,
    _CosmosLearnablePositionalEmbed,
    _CosmosPatchEmbed,
    cosmos_rope_np,
)


@dataclass
class CosmosControlNetOutput(BaseOutput):
    control_block_samples: List[jax.Array]


class CosmosControlNetModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        n_controlnet_blocks: int = 4,
        in_channels: int = 130,
        latent_channels: int = 18,
        model_channels: int = 2048,
        num_attention_heads: int = 32,
        attention_head_dim: int = 128,
        mlp_ratio: float = 4.0,
        text_embed_dim: int = 1024,
        adaln_lora_dim: int = 256,
        patch_size: Tuple[int, ...] = (1, 2, 2),
        max_size: Tuple[int, ...] = (128, 240, 240),
        rope_scale: Tuple[float, ...] = (2.0, 1.0, 1.0),
        extra_pos_embed_type: Optional[str] = None,
        img_context_dim_in: Optional[int] = None,
        img_context_dim_out: int = 2048,
        use_crossattn_projection: bool = False,
        crossattn_proj_in_channels: int = 1024,
        encoder_hidden_states_channels: int = 1024,
    ):
        super().__init__()
        self.patch_embed = _CosmosPatchEmbed(in_channels, model_channels, patch_size, bias=False)
        self.patch_embed_base = _CosmosPatchEmbed(latent_channels, model_channels, patch_size, bias=False)
        self.time_embed = _CosmosEmbedding(model_channels, model_channels)
        self.learnable_pos_embed = (
            _CosmosLearnablePositionalEmbed(model_channels, max_size, patch_size)
            if extra_pos_embed_type == "learnable" else None
        )
        has_img_ctx = img_context_dim_in is not None and img_context_dim_in > 0
        if has_img_ctx:
            self.img_context_proj = ModuleList([Linear(img_context_dim_in, img_context_dim_out)])
        if use_crossattn_projection:
            self.crossattn_proj = ModuleList([Linear(crossattn_proj_in_channels,
                                                     encoder_hidden_states_channels)])
        self.control_blocks = ModuleList([
            CosmosTransformerBlock(
                num_attention_heads, attention_head_dim, text_embed_dim,
                mlp_ratio=mlp_ratio, adaln_lora_dim=adaln_lora_dim, out_bias=False,
                img_context=has_img_ctx, before_proj=(i == 0), after_proj=True,
            )
            for i in range(n_controlnet_blocks)
        ])

    def _expand_scale(self, conditioning_scale) -> List[float]:
        n = len(self.control_blocks)
        scales = conditioning_scale if isinstance(conditioning_scale, (list, tuple)) else [conditioning_scale] * n
        return (list(scales) * n)[:n]

    @staticmethod
    def _concat_padding(x: jax.Array, padding_mask: Optional[jax.Array]) -> jax.Array:
        B, _, T, H, W = x.shape
        if padding_mask is None:
            padding_mask = jnp.zeros((1, 1, H, W), x.dtype)
        if padding_mask.shape[-2:] != (H, W):
            padding_mask = jax.image.resize(
                padding_mask, (*padding_mask.shape[:-2], H, W), method="nearest"
            )
        pm = jnp.broadcast_to(padding_mask[:, :, None].astype(x.dtype), (B, 1, T, H, W))
        return jnp.concatenate([x, pm], axis=1)

    def __call__(
        self,
        params: Params,
        controls_latents: jax.Array,
        latents: jax.Array,
        timestep: jax.Array,
        encoder_hidden_states: Union[jax.Array, Tuple],
        condition_mask: Optional[jax.Array],
        conditioning_scale: Union[float, List[float]] = 1.0,
        padding_mask: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        fps: Optional[int] = None,
        return_dict: bool = True,
    ):
        B, C, T, H, W = controls_latents.shape
        p_t, p_h, p_w = self.config.patch_size

        # 1. control stream: pad channels to in_channels-2, + condition mask, + padding mask
        control = controls_latents
        vace_in = self.config.in_channels - 1
        if control.shape[1] < vace_in - 1:
            control = jnp.concatenate(
                [control, jnp.zeros((B, vace_in - 1 - control.shape[1], T, H, W), control.dtype)], axis=1)
        cmask = condition_mask if condition_mask is not None else jnp.zeros_like(controls_latents[:, :1])
        control = jnp.concatenate([control, cmask.astype(control.dtype)], axis=1)
        control = self._concat_padding(control, padding_mask)

        # 2. base stream (same processing as the transformer)
        base = latents
        if condition_mask is not None:
            base = jnp.concatenate([base, condition_mask.astype(base.dtype)], axis=1)
        base = self._concat_padding(base, padding_mask)

        # 3. shared positional embeddings
        cos, sin = cosmos_rope_np(
            self.config.attention_head_dim, self.config.patch_size, T, H, W,
            max_size=self.config.max_size, rope_scale=self.config.rope_scale, fps=fps,
        )
        rope = (jnp.asarray(cos), jnp.asarray(sin))
        extra_pos = (
            self.learnable_pos_embed(params["learnable_pos_embed"], control.shape)
            if self.learnable_pos_embed is not None else None
        )

        # 4./5. patchify both streams
        control_hs = self.patch_embed(params["patch_embed"], control)
        control_hs = control_hs.reshape(B, -1, control_hs.shape[-1])
        base_hs = self.patch_embed_base(params["patch_embed_base"], base)
        base_hs = base_hs.reshape(B, -1, base_hs.shape[-1])

        # 6. time embeddings (per-frame [B,1,T,1,1] or scalar [B])
        timestep = jnp.asarray(timestep)
        if timestep.ndim == 5:
            ppf, pph, ppw = T // p_t, H // p_h, W // p_w
            flat_t = timestep.reshape(-1)
            temb, embedded_timestep = self.time_embed(params["time_embed"], base_hs.dtype, flat_t)
            temb, embedded_timestep = (
                jnp.broadcast_to(v.reshape(B, ppf, 1, 1, -1), (B, ppf, pph, ppw, v.shape[-1]))
                .reshape(B, ppf * pph * ppw, -1)
                for v in (temb, embedded_timestep)
            )
        else:
            temb, embedded_timestep = self.time_embed(params["time_embed"], base_hs.dtype,
                                                      jnp.atleast_1d(timestep))

        # 7. context projections
        img_ctx = None
        if isinstance(encoder_hidden_states, tuple):
            encoder_hidden_states, img_ctx = encoder_hidden_states
        if self.config.get("use_crossattn_projection"):
            encoder_hidden_states = jax.nn.gelu(
                self.crossattn_proj[0](params["crossattn_proj"][0], encoder_hidden_states))
        if img_ctx is not None and self.config.get("img_context_dim_in"):
            img_ctx = jax.nn.gelu(self.img_context_proj[0](params["img_context_proj"][0], img_ctx))
            encoder_hidden_states = (encoder_hidden_states, img_ctx)

        additive_mask = None
        if attention_mask is not None:
            additive_mask = ((1 - attention_mask.astype(jnp.float32)) * -1e9)[:, None, None, :]

        # 8. control blocks → scaled after_proj residuals
        result = []
        for i, (block, scale) in enumerate(zip(self.control_blocks, self._expand_scale(conditioning_scale))):
            control_hs, proj = block(
                params["control_blocks"][i], control_hs, encoder_hidden_states,
                embedded_timestep, temb, rope, extra_pos, additive_mask,
                latents=base_hs if i == 0 else None,
            )
            result.append(proj * scale)

        if not return_dict:
            return (result,)
        return CosmosControlNetOutput(control_block_samples=result)
