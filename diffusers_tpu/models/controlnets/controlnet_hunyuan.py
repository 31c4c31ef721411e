"""HunyuanDiT2DControlNetModel — ControlNet for HunyuanDiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/controlnets/controlnet_hunyuan.py:40`):
the first half (minus one) of the HunyuanDiT block stack, a zero-init
`input_block` adding the patch-embedded control image to the patch-embedded
latents, and zero-init per-block output projections scaled by
`conditioning_scale`. Reuses the HunyuanDiT block/embedding modules.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..embeddings import PatchEmbed, PixArtAlphaTextProjection
from ..modeling_utils import ModelMixin
from ..transformers.hunyuan_transformer_2d import (
    HunyuanCombinedTimestepTextSizeStyleEmbedding,
    HunyuanDiTBlock,
)


@dataclass
class HunyuanControlNetOutput(BaseOutput):
    controlnet_block_samples: Tuple[jax.Array, ...]


class HunyuanDiT2DControlNetModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        conditioning_channels: int = 3,
        num_attention_heads: int = 16,
        attention_head_dim: int = 88,
        in_channels: Optional[int] = None,
        patch_size: Optional[int] = None,
        activation_fn: str = "gelu-approximate",
        sample_size: int = 32,
        hidden_size: int = 1152,
        transformer_num_layers: int = 40,
        mlp_ratio: float = 4.0,
        cross_attention_dim: int = 1024,
        cross_attention_dim_t5: int = 2048,
        pooled_projection_dim: int = 1024,
        text_len: int = 77,
        text_len_t5: int = 256,
        use_style_cond_and_image_meta_size: bool = True,
    ):
        super().__init__()
        self.inner_dim = num_attention_heads * attention_head_dim
        self.pad_len = text_len + text_len_t5
        self.cross_attention_dim = cross_attention_dim

        self.text_embedder = PixArtAlphaTextProjection(
            in_features=cross_attention_dim_t5,
            hidden_size=cross_attention_dim_t5 * 4,
            out_features=cross_attention_dim,
            act_fn="silu_fp32",
        )
        self.pos_embed = PatchEmbed(
            height=sample_size, width=sample_size, in_channels=in_channels,
            embed_dim=hidden_size, patch_size=patch_size, pos_embed_type=None,
        )
        self.time_extra_emb = HunyuanCombinedTimestepTextSizeStyleEmbedding(
            hidden_size, pooled_projection_dim=pooled_projection_dim,
            seq_len=text_len_t5, cross_attention_dim=cross_attention_dim_t5,
            use_style_cond_and_image_meta_size=use_style_cond_and_image_meta_size,
        )
        n_blocks = transformer_num_layers // 2 - 1
        self.blocks = ModuleList([
            HunyuanDiTBlock(
                dim=self.inner_dim, num_attention_heads=num_attention_heads,
                activation_fn=activation_fn, ff_inner_dim=int(self.inner_dim * mlp_ratio),
                cross_attention_dim=cross_attention_dim, skip=False,
            )
            for _ in range(n_blocks)
        ])
        self.input_block = Linear(hidden_size, hidden_size)
        self.controlnet_blocks = ModuleList([
            Linear(hidden_size, hidden_size) for _ in range(n_blocks)
        ])

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 41)
        params["text_embedding_padding"] = jax.random.normal(
            k, (self.pad_len, self.cross_attention_dim), jnp.float32).astype(dtype)
        # zero-init input/output projections (reference zero_module)
        params["input_block"]["kernel"] = jnp.zeros_like(params["input_block"]["kernel"])
        params["input_block"]["bias"] = jnp.zeros_like(params["input_block"]["bias"])
        for i in range(len(self.controlnet_blocks)):
            params["controlnet_blocks"][i]["kernel"] = jnp.zeros_like(
                params["controlnet_blocks"][i]["kernel"])
            params["controlnet_blocks"][i]["bias"] = jnp.zeros_like(
                params["controlnet_blocks"][i]["bias"])
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, H, W]
        timestep: jax.Array,
        controlnet_cond: jax.Array,  # [B, C, H, W] latent-space control image
        conditioning_scale: float = 1.0,
        encoder_hidden_states: Optional[jax.Array] = None,
        text_embedding_mask: Optional[jax.Array] = None,
        encoder_hidden_states_t5: Optional[jax.Array] = None,
        text_embedding_mask_t5: Optional[jax.Array] = None,
        image_meta_size: Optional[jax.Array] = None,
        style: Optional[jax.Array] = None,
        image_rotary_emb=None,
        return_dict: bool = True,
    ):
        h = self.pos_embed(params["pos_embed"], hidden_states)
        h = h + self.input_block(params["input_block"],
                                 self.pos_embed(params["pos_embed"], controlnet_cond))

        temb = self.time_extra_emb(
            params["time_extra_emb"], timestep, encoder_hidden_states_t5,
            image_meta_size, style, h.dtype)

        t5_ctx = self.text_embedder(params["text_embedder"], encoder_hidden_states_t5)
        ctx = jnp.concatenate([encoder_hidden_states, t5_ctx], axis=1)
        mask = jnp.concatenate([text_embedding_mask, text_embedding_mask_t5],
                               axis=-1)[..., None].astype(bool)
        ctx = jnp.where(mask, ctx, params["text_embedding_padding"].astype(ctx.dtype)[None])

        block_res = []
        for i, block in enumerate(self.blocks):
            h = block(params["blocks"][i], h, encoder_hidden_states=ctx, temb=temb,
                      image_rotary_emb=image_rotary_emb)
            block_res.append(h)

        out = tuple(
            self.controlnet_blocks[i](params["controlnet_blocks"][i], s) * conditioning_scale
            for i, s in enumerate(block_res)
        )
        if not return_dict:
            return (out,)
        return HunyuanControlNetOutput(controlnet_block_samples=out)


class HunyuanDiT2DMultiControlNetModel:
    """List wrapper summing per-net block samples (reference :311)."""

    def __init__(self, controlnets: List[HunyuanDiT2DControlNetModel]):
        self.nets = list(controlnets)

    def __call__(self, params_list, hidden_states, timestep, controlnet_cond,
                 conditioning_scale, **kwargs):
        if not isinstance(conditioning_scale, (list, tuple)):
            conditioning_scale = [conditioning_scale] * len(self.nets)
        total = None
        for net, p, image, scale in zip(self.nets, params_list, controlnet_cond,
                                        conditioning_scale):
            samples = net(p, hidden_states, timestep, image, scale, **kwargs).controlnet_block_samples
            if total is None:
                total = list(samples)
            else:
                total = [a + b for a, b in zip(total, samples)]
        return HunyuanControlNetOutput(controlnet_block_samples=tuple(total))
