"""BriaTransformer2DModel — Bria's Flux-architecture t2i transformer.

Behavioral mirror of the reference
`models/transformers/transformer_bria.py`: Flux MMDiT blocks verbatim
but with NO pooled-projection conditioning (temb = timestep embedding
only, `BriaTimestepProjEmbeddings` `:319`), optional non-distilled
guidance embedding, configurable rope/time theta. Reuses our Flux block
implementations (`transformer_flux.py`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..embeddings import FluxPosEmbed, TimestepEmbedding, get_timestep_embedding
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNormContinuous
from .transformer_flux import FluxSingleTransformerBlock, FluxTransformerBlock


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class _BriaTimestepProjEmbeddings(Module):
    def __init__(self, embedding_dim: int, time_theta: float = 10000):
        super().__init__()
        self.time_theta = time_theta
        self.timestep_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=embedding_dim)

    def __call__(self, params: Params, timestep: jax.Array, dtype) -> jax.Array:
        proj = get_timestep_embedding(
            timestep, 256, flip_sin_to_cos=True, downscale_freq_shift=0, max_period=self.time_theta
        )
        return self.timestep_embedder(params["timestep_embedder"], proj.astype(dtype))


class BriaTransformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        patch_size: int = 1,
        in_channels: int = 64,
        num_layers: int = 19,
        num_single_layers: int = 38,
        attention_head_dim: int = 128,
        num_attention_heads: int = 24,
        joint_attention_dim: int = 4096,
        pooled_projection_dim: Optional[int] = None,
        guidance_embeds: bool = False,
        axes_dims_rope: List[int] = [16, 56, 56],
        rope_theta: float = 10000,
        time_theta: float = 10000,
    ):
        super().__init__()
        self.out_channels = in_channels
        self.inner_dim = num_attention_heads * attention_head_dim

        self.pos_embed = FluxPosEmbed(theta=rope_theta, axes_dim=axes_dims_rope)
        self.time_embed = _BriaTimestepProjEmbeddings(self.inner_dim, time_theta)
        if guidance_embeds:
            self.guidance_embed = _BriaTimestepProjEmbeddings(self.inner_dim)
        self.context_embedder = Linear(joint_attention_dim, self.inner_dim)
        self.x_embedder = Linear(in_channels, self.inner_dim)
        self.transformer_blocks = ModuleList([
            FluxTransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim)
            for _ in range(num_layers)
        ])
        self.single_transformer_blocks = ModuleList([
            FluxSingleTransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim)
            for _ in range(num_single_layers)
        ])
        self.norm_out = AdaLayerNormContinuous(self.inner_dim, self.inner_dim,
                                               elementwise_affine=False, eps=1e-6)
        self.proj_out = Linear(self.inner_dim, patch_size * patch_size * self.out_channels, use_bias=True)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        encoder_hidden_states: jax.Array = None,
        timestep: jax.Array = None,
        img_ids: jax.Array = None,
        txt_ids: jax.Array = None,
        guidance: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        x = self.x_embedder(params["x_embedder"], hidden_states)
        timestep = jnp.asarray(timestep).astype(x.dtype)
        temb = self.time_embed(params["time_embed"], timestep, x.dtype)
        if guidance is not None and hasattr(self, "guidance_embed"):
            temb = temb + self.guidance_embed(params["guidance_embed"],
                                              jnp.asarray(guidance).astype(x.dtype), x.dtype)
        ehs = self.context_embedder(params["context_embedder"], encoder_hidden_states)

        if txt_ids.ndim == 3:
            txt_ids = txt_ids[0]
        if img_ids.ndim == 3:
            img_ids = img_ids[0]
        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        rope = self.pos_embed({}, ids)

        for i, block in enumerate(self.transformer_blocks):
            ehs, x = block(params["transformer_blocks"][i], x, ehs, temb, rope)
        for i, block in enumerate(self.single_transformer_blocks):
            ehs, x = block(params["single_transformer_blocks"][i], x, ehs, temb, rope)

        x = self.norm_out(params["norm_out"], x, temb)
        output = self.proj_out(params["proj_out"], x)
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)
