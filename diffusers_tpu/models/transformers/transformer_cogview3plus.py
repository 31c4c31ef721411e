"""CogView3PlusTransformer2DModel.

Behavioral mirror of the reference
`models/transformers/transformer_cogview3plus.py`:
CogView3PlusPatchEmbed (`embeddings.py:775` — linear patchify, text proj,
2D sincos positional table sliced [H, W], ZERO text positions),
CogView3CombinedTimestepSizeEmbeddings (`embeddings.py:1628` — SDXL-style
original/crop/target size sincos conditions), 12-way AdaLN-zero over the
text and image streams (`normalization.py:403`), joint attention with
NON-affine per-head qk LayerNorm (`:58-68`), AdaLN-continuous out.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import (
    PixArtAlphaTextProjection,
    TimestepEmbedding,
    Timesteps,
    get_2d_sincos_pos_embed,
)
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNormContinuous
from .cogvideox_transformer_3d import CogVideoXAttention


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class CogView3PlusPatchEmbed(Module):
    def __init__(self, in_channels=16, hidden_size=2560, patch_size=2,
                 text_hidden_size=4096, pos_embed_max_size=128):
        super().__init__()
        self.patch_size = patch_size
        self.hidden_size = hidden_size
        self.pos_embed_max_size = pos_embed_max_size
        self.proj = Linear(in_channels * patch_size**2, hidden_size)
        self.text_proj = Linear(text_hidden_size, hidden_size)
        pos = get_2d_sincos_pos_embed(hidden_size, pos_embed_max_size, base_size=pos_embed_max_size)
        self._pos_embed = pos.reshape(pos_embed_max_size, pos_embed_max_size, hidden_size)

    def __call__(self, params: Params, hidden_states: jax.Array, encoder_hidden_states: jax.Array) -> jax.Array:
        B, C, H, W = hidden_states.shape
        p = self.patch_size
        h, w = H // p, W // p
        x = hidden_states.reshape(B, C, h, p, w, p)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(B, h * w, C * p * p)
        x = self.proj(params["proj"], x)
        text = self.text_proj(params["text_proj"], encoder_hidden_states)
        joint = jnp.concatenate([text, x], axis=1)
        img_pos = jnp.asarray(self._pos_embed[:h, :w].reshape(h * w, -1), dtype=joint.dtype)
        pos = jnp.concatenate([jnp.zeros((text.shape[1], self.hidden_size), joint.dtype), img_pos], axis=0)
        return joint + pos[None]


class CogView3CombinedTimestepSizeEmbeddings(Module):
    def __init__(self, embedding_dim: int, condition_dim: int, pooled_projection_dim: int, timesteps_dim: int = 256):
        super().__init__()
        self.time_proj = Timesteps(num_channels=timesteps_dim, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.condition_proj = Timesteps(num_channels=condition_dim, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=timesteps_dim, time_embed_dim=embedding_dim)
        self.condition_embedder = PixArtAlphaTextProjection(pooled_projection_dim, embedding_dim, act_fn="silu")

    def __call__(self, params: Params, timestep, original_size, target_size, crop_coords, dtype):
        t_proj = self.time_proj({}, timestep)
        B = original_size.shape[0]
        os_proj = self.condition_proj({}, original_size.reshape(-1)).reshape(B, -1)
        cc_proj = self.condition_proj({}, crop_coords.reshape(-1)).reshape(B, -1)
        ts_proj = self.condition_proj({}, target_size.reshape(-1)).reshape(B, -1)
        cond = jnp.concatenate([os_proj, cc_proj, ts_proj], axis=1)
        t_emb = self.timestep_embedder(params["timestep_embedder"], t_proj.astype(dtype))
        c_emb = self.condition_embedder(params["condition_embedder"], cond.astype(dtype))
        return t_emb + c_emb


class _CogView3AdaLayerNormZeroTextImage(Module):
    """12-chunk AdaLN-zero over image + text streams (reference
    normalization.py:403)."""

    def __init__(self, embedding_dim: int, dim: int):
        super().__init__()
        self.linear = Linear(embedding_dim, 12 * dim, use_bias=True)
        self.norm_x = LayerNorm(dim, eps=1e-5, use_scale=False, use_bias=False)
        self.norm_c = LayerNorm(dim, eps=1e-5, use_scale=False, use_bias=False)

    def __call__(self, params: Params, x: jax.Array, context: jax.Array, emb: jax.Array):
        emb = self.linear(params["linear"], jax.nn.silu(emb))
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp,
         c_shift_msa, c_scale_msa, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp) = jnp.split(emb, 12, axis=1)
        norm_x = self.norm_x(params.get("norm_x", {}), x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        norm_c = self.norm_c(params.get("norm_c", {}), context) * (1 + c_scale_msa[:, None]) + c_shift_msa[:, None]
        return (norm_x, gate_msa, shift_mlp, scale_mlp, gate_mlp,
                norm_c, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp)


class CogView3PlusTransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int, time_embed_dim: int):
        super().__init__()
        self.norm1 = _CogView3AdaLayerNormZeroTextImage(time_embed_dim, dim)
        self.attn1 = CogVideoXAttention(
            dim, num_attention_heads, attention_head_dim, qk_norm=True, bias=True,
            out_bias=True, qk_norm_affine=False,
        )
        self.norm2 = LayerNorm(dim, eps=1e-5, use_scale=False, use_bias=False)
        self.norm2_context = LayerNorm(dim, eps=1e-5, use_scale=False, use_bias=False)
        self.ff = FeedForward(dim, dim_out=dim, activation_fn="gelu-approximate")

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, emb):
        text_len = encoder_hidden_states.shape[1]
        (norm_hs, gate_msa, shift_mlp, scale_mlp, gate_mlp,
         norm_ehs, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp) = self.norm1(
            params["norm1"], hidden_states, encoder_hidden_states, emb
        )
        attn_hs, attn_ehs = self.attn1(params["attn1"], norm_hs, norm_ehs)
        hidden_states = hidden_states + gate_msa[:, None] * attn_hs
        encoder_hidden_states = encoder_hidden_states + c_gate_msa[:, None] * attn_ehs

        norm_hs = self.norm2(params.get("norm2", {}), hidden_states) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        norm_ehs = self.norm2_context(params.get("norm2_context", {}), encoder_hidden_states)
        norm_ehs = norm_ehs * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]

        ff_out = self.ff(params["ff"], jnp.concatenate([norm_ehs, norm_hs], axis=1))
        hidden_states = hidden_states + gate_mlp[:, None] * ff_out[:, text_len:]
        encoder_hidden_states = encoder_hidden_states + c_gate_mlp[:, None] * ff_out[:, :text_len]
        return hidden_states, encoder_hidden_states


class CogView3PlusTransformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        patch_size: int = 2,
        in_channels: int = 16,
        num_layers: int = 30,
        attention_head_dim: int = 40,
        num_attention_heads: int = 64,
        out_channels: int = 16,
        text_embed_dim: int = 4096,
        time_embed_dim: int = 512,
        condition_dim: int = 256,
        pos_embed_max_size: int = 128,
        sample_size: int = 128,
    ):
        super().__init__()
        self.out_channels = out_channels
        self.inner_dim = num_attention_heads * attention_head_dim
        self.pooled_projection_dim = 3 * 2 * condition_dim

        self.patch_embed = CogView3PlusPatchEmbed(
            in_channels=in_channels, hidden_size=self.inner_dim, patch_size=patch_size,
            text_hidden_size=text_embed_dim, pos_embed_max_size=pos_embed_max_size,
        )
        self.time_condition_embed = CogView3CombinedTimestepSizeEmbeddings(
            embedding_dim=time_embed_dim, condition_dim=condition_dim,
            pooled_projection_dim=self.pooled_projection_dim, timesteps_dim=self.inner_dim,
        )
        self.transformer_blocks = ModuleList([
            CogView3PlusTransformerBlock(
                dim=self.inner_dim, num_attention_heads=num_attention_heads,
                attention_head_dim=attention_head_dim, time_embed_dim=time_embed_dim,
            )
            for _ in range(num_layers)
        ])
        self.norm_out = AdaLayerNormContinuous(
            embedding_dim=self.inner_dim, conditioning_embedding_dim=time_embed_dim,
            elementwise_affine=False, eps=1e-6,
        )
        self.proj_out = Linear(self.inner_dim, patch_size * patch_size * out_channels, use_bias=True)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        encoder_hidden_states: jax.Array,
        timestep: jax.Array,
        original_size: jax.Array,
        target_size: jax.Array,
        crop_coords: jax.Array,
        return_dict: bool = True,
    ):
        H, W = hidden_states.shape[-2:]
        text_len = encoder_hidden_states.shape[1]

        joint = self.patch_embed(params["patch_embed"], hidden_states, encoder_hidden_states)
        emb = self.time_condition_embed(
            params["time_condition_embed"], jnp.atleast_1d(jnp.asarray(timestep)),
            original_size, target_size, crop_coords, joint.dtype,
        )
        encoder_hidden_states = joint[:, :text_len]
        x = joint[:, text_len:]

        for i, block in enumerate(self.transformer_blocks):
            x, encoder_hidden_states = block(
                params["transformer_blocks"][i], x, encoder_hidden_states, emb
            )

        x = self.norm_out(params["norm_out"], x, emb)
        x = self.proj_out(params["proj_out"], x)

        p = self.config.patch_size
        h, w = H // p, W // p
        x = x.reshape(x.shape[0], h, w, self.out_channels, p, p)
        x = jnp.einsum("nhwcpq->nchpwq", x)
        output = x.reshape(x.shape[0], self.out_channels, h * p, w * p)
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)
