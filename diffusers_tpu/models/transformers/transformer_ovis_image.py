"""OvisImageTransformer2DModel — Ovis-Image MMDiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_ovis_image.py:384`):
Flux-architecture dual + single stream DiT with SwiGLU feed-forwards in the
dual blocks (`:272` — vs Flux's gelu), a GATED single-block MLP
(`silu(gate) * states`, `:215` — vs Flux's plain gelu), an RMS-normed
context embedder (`:443`), and no pooled/guidance conditioning (timestep
only). Attention is identical to Flux, so `FluxAttention` is reused.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import (
    TimestepEmbedding,
    Timesteps,
    apply_rotary_emb,
    get_1d_rotary_pos_embed_np,
)
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNormContinuous, AdaLayerNormZero, AdaLayerNormZeroSingle
from .transformer_flux import FluxAttention


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class OvisImagePosEmbed:
    """Host-side 3-axis rope (reference OvisImagePosEmbed :356)."""

    def __init__(self, theta: int, axes_dim):
        self.theta = theta
        self.axes_dim = list(axes_dim)

    def __call__(self, ids: np.ndarray) -> Tuple[jax.Array, jax.Array]:
        ids = np.asarray(ids, dtype=np.float64)
        cos_out, sin_out = [], []
        for i in range(ids.shape[-1]):
            cos, sin = get_1d_rotary_pos_embed_np(self.axes_dim[i], ids[:, i], theta=self.theta,
                                                  repeat_interleave_real=True)
            cos_out.append(cos)
            sin_out.append(sin)
        return (jnp.asarray(np.concatenate(cos_out, axis=-1), jnp.float32),
                jnp.asarray(np.concatenate(sin_out, axis=-1), jnp.float32))


class OvisImageSingleTransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int,
                 mlp_ratio: float = 4.0):
        super().__init__()
        self.mlp_hidden_dim = int(dim * mlp_ratio)
        self.norm = AdaLayerNormZeroSingle(dim)
        self.proj_mlp = Linear(dim, self.mlp_hidden_dim * 2)
        self.proj_out = Linear(dim + self.mlp_hidden_dim, dim)
        self.attn = FluxAttention(query_dim=dim, heads=num_attention_heads,
                                  dim_head=attention_head_dim, out_dim=dim, bias=True,
                                  eps=1e-6, pre_only=True)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb,
                 image_rotary_emb=None):
        text_seq_len = encoder_hidden_states.shape[1]
        hidden_states = jnp.concatenate([encoder_hidden_states, hidden_states], axis=1)
        residual = hidden_states
        norm_h, gate = self.norm(params["norm"], hidden_states, emb=temb)
        mlp_states, mlp_gate = jnp.split(self.proj_mlp(params["proj_mlp"], norm_h), 2, axis=-1)
        mlp_states = jax.nn.silu(mlp_gate) * mlp_states
        attn_output = self.attn(params["attn"], norm_h, image_rotary_emb=image_rotary_emb)
        h = jnp.concatenate([attn_output, mlp_states], axis=2)
        h = residual + gate[:, None] * self.proj_out(params["proj_out"], h)
        return h[:, :text_seq_len], h[:, text_seq_len:]


class OvisImageTransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int,
                 eps: float = 1e-6):
        super().__init__()
        self.norm1 = AdaLayerNormZero(dim)
        self.norm1_context = AdaLayerNormZero(dim)
        self.attn = FluxAttention(query_dim=dim, added_kv_proj_dim=dim,
                                  heads=num_attention_heads, dim_head=attention_head_dim,
                                  out_dim=dim, context_pre_only=False, bias=True, eps=eps)
        self.norm2 = LayerNorm(dim, eps=1e-6, use_scale=False, use_bias=False)
        self.ff = FeedForward(dim=dim, dim_out=dim, activation_fn="swiglu")
        self.norm2_context = LayerNorm(dim, eps=1e-6, use_scale=False, use_bias=False)
        self.ff_context = FeedForward(dim=dim, dim_out=dim, activation_fn="swiglu")

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb,
                 image_rotary_emb=None):
        norm_h, gate_msa, shift_mlp, scale_mlp, gate_mlp = self.norm1(
            params["norm1"], hidden_states, emb=temb)
        norm_c, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = self.norm1_context(
            params["norm1_context"], encoder_hidden_states, emb=temb)
        attn_output, context_attn_output = self.attn(
            params["attn"], norm_h, encoder_hidden_states=norm_c,
            image_rotary_emb=image_rotary_emb)

        hidden_states = hidden_states + gate_msa[:, None] * attn_output
        norm_h = self.norm2({}, hidden_states)
        norm_h = norm_h * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        hidden_states = hidden_states + gate_mlp[:, None] * self.ff(params["ff"], norm_h)

        encoder_hidden_states = encoder_hidden_states + c_gate_msa[:, None] * context_attn_output
        norm_c = self.norm2_context({}, encoder_hidden_states)
        norm_c = norm_c * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        encoder_hidden_states = encoder_hidden_states + c_gate_mlp[:, None] * self.ff_context(
            params["ff_context"], norm_c)
        return encoder_hidden_states, hidden_states


class OvisImageTransformer2DModel(Module, ModelMixin, ConfigMixin):
    """Ovis-Image DiT (reference OvisImageTransformer2DModel :384)."""

    @register_to_config
    def __init__(
        self,
        patch_size: int = 1,
        in_channels: int = 64,
        out_channels: Optional[int] = 64,
        num_layers: int = 6,
        num_single_layers: int = 27,
        attention_head_dim: int = 128,
        num_attention_heads: int = 24,
        joint_attention_dim: int = 2048,
        axes_dims_rope: Tuple[int, int, int] = (16, 56, 56),
    ):
        super().__init__()
        self.out_channels = out_channels or in_channels
        self.inner_dim = num_attention_heads * attention_head_dim
        self.pos_embed = OvisImagePosEmbed(theta=10000, axes_dim=axes_dims_rope)
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256, time_embed_dim=self.inner_dim)
        self.context_embedder_norm = RMSNorm(joint_attention_dim, eps=1e-6)
        self.context_embedder = Linear(joint_attention_dim, self.inner_dim)
        self.x_embedder = Linear(in_channels, self.inner_dim)
        self.transformer_blocks = ModuleList([
            OvisImageTransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim)
            for _ in range(num_layers)
        ])
        self.single_transformer_blocks = ModuleList([
            OvisImageSingleTransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim)
            for _ in range(num_single_layers)
        ])
        self.norm_out = AdaLayerNormContinuous(self.inner_dim, self.inner_dim,
                                               elementwise_affine=False, eps=1e-6)
        self.proj_out = Linear(self.inner_dim, patch_size * patch_size * self.out_channels)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        encoder_hidden_states: jax.Array,
        timestep: jax.Array,
        image_rotary_emb: Tuple[jax.Array, jax.Array],
        return_dict: bool = True,
    ):
        """`image_rotary_emb` is the precomputed (cos, sin) over
        cat([txt_ids, img_ids]) from `self.pos_embed` (host-side)."""
        hidden_states = self.x_embedder(params["x_embedder"], hidden_states)
        timestep = timestep.astype(hidden_states.dtype) * 1000
        temb = self.timestep_embedder(
            params["timestep_embedder"], self.time_proj({}, timestep).astype(hidden_states.dtype))
        encoder_hidden_states = self.context_embedder_norm(
            params["context_embedder_norm"], encoder_hidden_states)
        encoder_hidden_states = self.context_embedder(params["context_embedder"],
                                                      encoder_hidden_states)

        for i, block in enumerate(self.transformer_blocks):
            encoder_hidden_states, hidden_states = block(
                params["transformer_blocks"][i], hidden_states, encoder_hidden_states, temb,
                image_rotary_emb=image_rotary_emb)
        for i, block in enumerate(self.single_transformer_blocks):
            encoder_hidden_states, hidden_states = block(
                params["single_transformer_blocks"][i], hidden_states, encoder_hidden_states,
                temb, image_rotary_emb=image_rotary_emb)

        hidden_states = self.norm_out(params["norm_out"], hidden_states, temb)
        output = self.proj_out(params["proj_out"], hidden_states)
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)
