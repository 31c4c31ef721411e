"""BriaFiboTransformer2DModel — Bria FIBO structured-prompt MMDiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_bria_fibo.py:429`):
Flux dual/single architecture (blocks reused from our Flux implementation)
with PER-BLOCK text-layer injection — before every block the second half of
the context channels is replaced by a per-block projection of one of the
text encoder's hidden-state layers (`:585`), HiDream-style; configurable
sinusoid `time_theta`; no pooled conditioning.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, get_1d_rotary_pos_embed_np, get_timestep_embedding
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNormContinuous
from .transformer_flux import FluxSingleTransformerBlock, FluxTransformerBlock


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class BriaFiboEmbedND:
    """Host-side Flux-style multi-axis rope (reference :213)."""

    def __init__(self, theta: float, axes_dim):
        self.theta = theta
        self.axes_dim = list(axes_dim)

    def __call__(self, ids: np.ndarray):
        ids = np.asarray(ids, dtype=np.float64)
        cos_out, sin_out = [], []
        for i in range(ids.shape[-1]):
            cos, sin = get_1d_rotary_pos_embed_np(self.axes_dim[i], ids[:, i], theta=self.theta)
            cos_out.append(cos)
            sin_out.append(sin)
        return (jnp.asarray(np.concatenate(cos_out, axis=-1), jnp.float32),
                jnp.asarray(np.concatenate(sin_out, axis=-1), jnp.float32))


class BriaFiboTimestepProjEmbeddings(Module):
    def __init__(self, embedding_dim: int, time_theta: float):
        super().__init__()
        self.time_theta = time_theta
        self.timestep_embedder = TimestepEmbedding(256, embedding_dim)

    def __call__(self, params: Params, timestep: jax.Array, dtype) -> jax.Array:
        proj = get_timestep_embedding(timestep, 256, flip_sin_to_cos=True,
                                      downscale_freq_shift=0,
                                      max_period=int(self.time_theta)).astype(dtype)
        return self.timestep_embedder(params["timestep_embedder"], proj)


class BriaFiboTextProjection(Module):
    def __init__(self, in_features: int, hidden_size: int):
        super().__init__()
        self.linear = Linear(in_features, hidden_size, use_bias=False)

    def __call__(self, params: Params, caption: jax.Array) -> jax.Array:
        return self.linear(params["linear"], caption)


class BriaFiboTransformer2DModel(Module, ModelMixin, ConfigMixin):
    """Bria FIBO DiT (reference :429)."""

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
        text_encoder_dim: int = 2048,
    ):
        super().__init__()
        self.out_channels = in_channels
        self.inner_dim = num_attention_heads * attention_head_dim
        self.pos_embed = BriaFiboEmbedND(theta=rope_theta, axes_dim=axes_dims_rope)
        self.time_embed = BriaFiboTimestepProjEmbeddings(self.inner_dim, time_theta)
        if guidance_embeds:
            self.guidance_embed = BriaFiboTimestepProjEmbeddings(self.inner_dim, time_theta)
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
        self.proj_out = Linear(self.inner_dim, patch_size * patch_size * self.out_channels)
        self.caption_projection = ModuleList([
            BriaFiboTextProjection(text_encoder_dim, self.inner_dim // 2)
            for _ in range(num_layers + num_single_layers)
        ])

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, S_img, in_channels] packed
        encoder_hidden_states: jax.Array,  # [B, S_txt, joint_attention_dim]
        text_encoder_layers: List[jax.Array],
        timestep: jax.Array,
        image_rotary_emb: Tuple[jax.Array, jax.Array],
        guidance: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        hidden_states = self.x_embedder(params["x_embedder"], hidden_states)
        dtype = hidden_states.dtype
        temb = self.time_embed(params["time_embed"], timestep.astype(dtype), dtype)
        if guidance is not None:
            temb = temb + self.guidance_embed(params["guidance_embed"],
                                              guidance.astype(dtype), dtype)
        ehs = self.context_embedder(params["context_embedder"], encoder_hidden_states)

        half = self.inner_dim // 2
        projected = [
            self.caption_projection[i](params["caption_projection"][i], layer)
            for i, layer in enumerate(text_encoder_layers)
        ]

        block_id = 0
        for i, block in enumerate(self.transformer_blocks):
            ehs = jnp.concatenate([ehs[:, :, :half], projected[block_id].astype(ehs.dtype)],
                                  axis=-1)
            block_id += 1
            ehs, hidden_states = block(params["transformer_blocks"][i], hidden_states, ehs,
                                       temb, image_rotary_emb=image_rotary_emb)

        for i, block in enumerate(self.single_transformer_blocks):
            ehs = jnp.concatenate([ehs[:, :, :half], projected[block_id].astype(ehs.dtype)],
                                  axis=-1)
            block_id += 1
            ehs, hidden_states = block(params["single_transformer_blocks"][i], hidden_states,
                                       ehs, temb, image_rotary_emb=image_rotary_emb)

        hidden_states = self.norm_out(params["norm_out"], hidden_states, temb)
        output = self.proj_out(params["proj_out"], hidden_states)
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)
