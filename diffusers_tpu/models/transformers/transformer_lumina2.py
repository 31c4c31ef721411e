"""Lumina2Transformer2DModel — Lumina Image 2.0 NextDiT.

Behavioral mirror of the reference
`/root/reference/src/diffusers/models/transformers/transformer_lumina2.py`
(combined timestep/caption embedding `:37`, attention `:68`, block `:152`,
3-axis RoPE `:233`, model `:325`, forward `:459`) plus LuminaFeedForward
(`models/attention.py:1083`), LuminaRMSNormZero
(`models/normalization.py:205`), LuminaLayerNormContinuous (`:354`).

TPU design: the reference packs each sample's valid caption tokens directly
against its image tokens (dynamic offsets). Here the joint sequence keeps the
STATIC layout ``[caption (padded), image]`` with an attention mask over the
padding — attention is padding-invariant under masking, RoPE positions are
computed per token with traced per-sample caption lengths, and the image slice
stays a static-offset slice XLA can fuse.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


def _rotate_pairs(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Complex pair rotation (reference apply_rotary_emb use_real=False)."""
    xf = x.astype(jnp.float32)
    x_even, x_odd = xf[..., 0::2], xf[..., 1::2]
    out_even = x_even * cos - x_odd * sin
    out_odd = x_even * sin + x_odd * cos
    return jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)


class LuminaFeedForward(Module):
    def __init__(self, dim: int, inner_dim: int, multiple_of: int = 256,
                 ffn_dim_multiplier: Optional[float] = None):
        super().__init__()
        if ffn_dim_multiplier is not None:
            inner_dim = int(ffn_dim_multiplier * inner_dim)
        inner_dim = multiple_of * ((inner_dim + multiple_of - 1) // multiple_of)
        self.linear_1 = Linear(dim, inner_dim, use_bias=False)
        self.linear_2 = Linear(inner_dim, dim, use_bias=False)
        self.linear_3 = Linear(dim, inner_dim, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        # FP32SiLU gate (reference attention.py:1126)
        gate = jax.nn.silu(self.linear_1(params["linear_1"], x).astype(jnp.float32)).astype(x.dtype)
        return self.linear_2(params["linear_2"], gate * self.linear_3(params["linear_3"], x))


class _LuminaAttention(Module):
    """GQA self-attention with per-head qk RMSNorm and pair-rotation RoPE."""

    def __init__(self, dim: int, heads: int, kv_heads: int, eps: float = 1e-5):
        super().__init__()
        self.heads = heads
        self.kv_heads = kv_heads
        self.head_dim = dim // heads
        self.to_q = Linear(dim, heads * self.head_dim, use_bias=False)
        self.to_k = Linear(dim, kv_heads * self.head_dim, use_bias=False)
        self.to_v = Linear(dim, kv_heads * self.head_dim, use_bias=False)
        self.norm_q = RMSNorm(self.head_dim, eps=eps)
        self.norm_k = RMSNorm(self.head_dim, eps=eps)
        self.to_out = ModuleList([Linear(heads * self.head_dim, dim, use_bias=False)])

    def __call__(self, params: Params, x, attention_mask=None, rotary_emb=None):
        b, s, _ = x.shape
        q = self.to_q(params["to_q"], x).reshape(b, s, self.heads, self.head_dim)
        k = self.to_k(params["to_k"], x).reshape(b, s, self.kv_heads, self.head_dim)
        v = self.to_v(params["to_v"], x).reshape(b, s, self.kv_heads, self.head_dim)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)
        if rotary_emb is not None:
            cos, sin = rotary_emb  # [B, S, D/2] fp32
            q = _rotate_pairs(q, cos[:, :, None], sin[:, :, None]).astype(x.dtype)
            k = _rotate_pairs(k, cos[:, :, None], sin[:, :, None]).astype(x.dtype)
        n_rep = self.heads // self.kv_heads
        if n_rep > 1:
            k = jnp.repeat(k, n_rep, axis=2)
            v = jnp.repeat(v, n_rep, axis=2)
        bias = None
        if attention_mask is not None:
            bias = jnp.where(attention_mask.astype(bool), 0.0, -jnp.inf).astype(jnp.float32)[:, None, None, :]
        out = dispatch_attention_fn(q, k, v, attn_mask=bias)
        out = out.reshape(b, s, self.heads * self.head_dim).astype(x.dtype)
        return self.to_out[0](params["to_out"][0], out)


class Lumina2TransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, num_kv_heads: int,
                 multiple_of: int, ffn_dim_multiplier: Optional[float], norm_eps: float,
                 modulation: bool = True):
        super().__init__()
        self.modulation = modulation
        self.attn = _LuminaAttention(dim, num_attention_heads, num_kv_heads, eps=1e-5)
        self.feed_forward = LuminaFeedForward(dim, 4 * dim, multiple_of, ffn_dim_multiplier)
        if modulation:
            # LuminaRMSNormZero: linear(min(dim,1024) -> 4*dim) + RMSNorm(dim)
            self.norm1 = _LuminaRMSNormZero(dim, norm_eps)
        else:
            self.norm1 = RMSNorm(dim, eps=norm_eps)
        self.ffn_norm1 = RMSNorm(dim, eps=norm_eps)
        self.norm2 = RMSNorm(dim, eps=norm_eps)
        self.ffn_norm2 = RMSNorm(dim, eps=norm_eps)

    def __call__(self, params: Params, x, attention_mask, rotary_emb, temb=None):
        if self.modulation:
            norm_x, gate_msa, scale_mlp, gate_mlp = self.norm1(params["norm1"], x, temb)
            attn_out = self.attn(params["attn"], norm_x, attention_mask, rotary_emb)
            x = x + jnp.tanh(gate_msa)[:, None] * self.norm2(params["norm2"], attn_out)
            mlp = self.feed_forward(
                params["feed_forward"],
                self.ffn_norm1(params["ffn_norm1"], x) * (1 + scale_mlp[:, None]),
            )
            x = x + jnp.tanh(gate_mlp)[:, None] * self.ffn_norm2(params["ffn_norm2"], mlp)
        else:
            norm_x = self.norm1(params["norm1"], x)
            attn_out = self.attn(params["attn"], norm_x, attention_mask, rotary_emb)
            x = x + self.norm2(params["norm2"], attn_out)
            mlp = self.feed_forward(params["feed_forward"], self.ffn_norm1(params["ffn_norm1"], x))
            x = x + self.ffn_norm2(params["ffn_norm2"], mlp)
        return x


class _LuminaRMSNormZero(Module):
    def __init__(self, dim: int, norm_eps: float):
        super().__init__()
        self.linear = Linear(min(dim, 1024), 4 * dim, use_bias=True)
        self.norm = RMSNorm(dim, eps=norm_eps)

    def __call__(self, params: Params, x, emb):
        mods = self.linear(params["linear"], jax.nn.silu(emb))
        scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(mods, 4, axis=1)
        x = self.norm(params["norm"], x) * (1 + scale_msa[:, None])
        return x, gate_msa, scale_mlp, gate_mlp


class _TimeCaptionEmbed(Module):
    def __init__(self, hidden_size: int, cap_feat_dim: int, norm_eps: float,
                 frequency_embedding_size: int = 256):
        super().__init__()
        self.time_proj = Timesteps(frequency_embedding_size, flip_sin_to_cos=True, downscale_freq_shift=0.0)
        self.timestep_embedder = TimestepEmbedding(frequency_embedding_size, min(hidden_size, 1024))
        self.caption_embedder = ModuleList([RMSNorm(cap_feat_dim, eps=norm_eps), Linear(cap_feat_dim, hidden_size)])

    def __call__(self, params: Params, timestep, encoder_hidden_states, dtype):
        t = self.time_proj({}, timestep).astype(dtype)
        temb = self.timestep_embedder(params["timestep_embedder"], t)
        cap = self.caption_embedder[0](params["caption_embedder"][0], encoder_hidden_states)
        cap = self.caption_embedder[1](params["caption_embedder"][1], cap)
        return temb, cap


class _NormOutContinuous(Module):
    """LuminaLayerNormContinuous: affine-free LN scaled by silu(temb) proj,
    then out projection (reference normalization.py:354)."""

    def __init__(self, embedding_dim: int, conditioning_embedding_dim: int, out_dim: int):
        super().__init__()
        self.embedding_dim = embedding_dim
        self.linear_1 = Linear(conditioning_embedding_dim, embedding_dim, use_bias=True)
        self.linear_2 = Linear(embedding_dim, out_dim, use_bias=True)
        self._norm = LayerNorm(embedding_dim, eps=1e-6, use_scale=False, use_bias=False)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params.pop("_norm", None)
        return params

    def __call__(self, params: Params, x, cond):
        scale = self.linear_1(params["linear_1"], jax.nn.silu(cond).astype(x.dtype))
        x = self._norm({}, x) * (1 + scale)[:, None, :]
        return self.linear_2(params["linear_2"], x)


class Lumina2Transformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        sample_size: int = 128,
        patch_size: int = 2,
        in_channels: int = 16,
        out_channels: Optional[int] = None,
        hidden_size: int = 2304,
        num_layers: int = 26,
        num_refiner_layers: int = 2,
        num_attention_heads: int = 24,
        num_kv_heads: int = 8,
        multiple_of: int = 256,
        ffn_dim_multiplier: Optional[float] = None,
        norm_eps: float = 1e-5,
        scaling_factor: float = 1.0,
        axes_dim_rope: Tuple[int, int, int] = (32, 32, 32),
        axes_lens: Tuple[int, int, int] = (300, 512, 512),
        cap_feat_dim: int = 1024,
    ):
        super().__init__()
        self.out_channels_ = out_channels or in_channels
        self.x_embedder = Linear(patch_size * patch_size * in_channels, hidden_size)
        self.time_caption_embed = _TimeCaptionEmbed(hidden_size, cap_feat_dim, norm_eps)
        self.noise_refiner = ModuleList(
            [
                Lumina2TransformerBlock(hidden_size, num_attention_heads, num_kv_heads,
                                        multiple_of, ffn_dim_multiplier, norm_eps, modulation=True)
                for _ in range(num_refiner_layers)
            ]
        )
        self.context_refiner = ModuleList(
            [
                Lumina2TransformerBlock(hidden_size, num_attention_heads, num_kv_heads,
                                        multiple_of, ffn_dim_multiplier, norm_eps, modulation=False)
                for _ in range(num_refiner_layers)
            ]
        )
        self.layers = ModuleList(
            [
                Lumina2TransformerBlock(hidden_size, num_attention_heads, num_kv_heads,
                                        multiple_of, ffn_dim_multiplier, norm_eps, modulation=True)
                for _ in range(num_layers)
            ]
        )
        self.norm_out = _NormOutContinuous(
            hidden_size, min(hidden_size, 1024), patch_size * patch_size * self.out_channels_
        )
        # per-axis rotary angle tables [len_i, dim_i/2] in float64 precision
        self._freq_tables = [
            np.asarray(self._rope_table(d, e, 10000), dtype=np.float64)
            for d, e in zip(axes_dim_rope, axes_lens)
        ]

    @staticmethod
    def _rope_table(dim: int, length: int, theta: float) -> np.ndarray:
        freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        pos = np.arange(length, dtype=np.float64)
        return np.outer(pos, freqs)  # [length, dim/2]

    def _rope(self, position_ids: jax.Array):
        """position_ids: [B, S, 3] int → (cos, sin) [B, S, sum(dims)/2] fp32."""
        parts = []
        for i, table in enumerate(self._freq_tables):
            t = jnp.asarray(table, dtype=jnp.float32)
            parts.append(jnp.take(t, position_ids[:, :, i], axis=0))  # [B, S, d/2]
        angles = jnp.concatenate(parts, axis=-1)
        return jnp.cos(angles), jnp.sin(angles)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, H, W]
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,  # [B, S_cap, cap_feat_dim]
        encoder_attention_mask: jax.Array,  # [B, S_cap]
        return_dict: bool = True,
    ):
        b, c, height, width = hidden_states.shape
        p = self.config.patch_size
        ph, pw = height // p, width // p
        img_len = ph * pw
        cap_len_max = encoder_hidden_states.shape[1]
        mask = encoder_attention_mask.astype(jnp.int32)
        cap_lens = jnp.sum(mask, axis=1)  # [B] traced

        temb, cap_embeds = self.time_caption_embed(
            params["time_caption_embed"], timestep, encoder_hidden_states, hidden_states.dtype
        )

        # patchify
        h = hidden_states.reshape(b, c, ph, p, pw, p)
        h = jnp.transpose(h, (0, 2, 4, 3, 5, 1)).reshape(b, img_len, p * p * c)
        h = self.x_embedder(params["x_embedder"], h)

        # RoPE position ids (reference `:263`): captions count up on axis 0;
        # image tokens sit at axis0 = cap_len with (row, col) on axes 1/2
        idx_cap = jnp.arange(cap_len_max, dtype=jnp.int32)
        cap_pos = jnp.minimum(idx_cap[None, :], cap_lens[:, None] - 1)
        cap_pos = jnp.where(idx_cap[None, :] < cap_lens[:, None], idx_cap[None, :], cap_pos)
        cap_position_ids = jnp.stack(
            [cap_pos, jnp.zeros_like(cap_pos), jnp.zeros_like(cap_pos)], axis=-1
        )
        rows = jnp.repeat(jnp.arange(ph, dtype=jnp.int32), pw)
        cols = jnp.tile(jnp.arange(pw, dtype=jnp.int32), ph)
        img_position_ids = jnp.stack(
            [
                jnp.broadcast_to(cap_lens[:, None], (b, img_len)),
                jnp.broadcast_to(rows[None], (b, img_len)),
                jnp.broadcast_to(cols[None], (b, img_len)),
            ],
            axis=-1,
        )
        cap_rope = self._rope(cap_position_ids)
        img_rope = self._rope(img_position_ids)
        joint_rope = (
            jnp.concatenate([cap_rope[0], img_rope[0]], axis=1),
            jnp.concatenate([cap_rope[1], img_rope[1]], axis=1),
        )

        # context & noise refinement
        cap = cap_embeds
        for i, layer in enumerate(self.context_refiner):
            cap = layer(params["context_refiner"][i], cap, encoder_attention_mask, cap_rope)
        for i, layer in enumerate(self.noise_refiner):
            h = layer(params["noise_refiner"][i], h, None, img_rope, temb)

        # joint pass over [cap (padded), image]
        joint = jnp.concatenate([cap, h], axis=1)
        joint_mask = jnp.concatenate([mask, jnp.ones((b, img_len), jnp.int32)], axis=1)
        for i, layer in enumerate(self.layers):
            joint = layer(params["layers"][i], joint, joint_mask, joint_rope, temb)

        out = self.norm_out(params["norm_out"], joint, temb)
        img = out[:, cap_len_max:]

        img = img.reshape(b, ph, pw, p, p, self.out_channels_)
        img = jnp.transpose(img, (0, 5, 1, 3, 2, 4)).reshape(b, self.out_channels_, height, width)

        if not return_dict:
            return (img,)
        return Transformer2DModelOutput(sample=img)
