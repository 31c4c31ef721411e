"""LuminaNextDiT2DModel (Lumina-Next-SFT).

Behavioral mirror of the reference
`models/transformers/lumina_nextdit2d.py`: per-block LuminaRMSNormZero
(scale-only AdaLN over RMS, `normalization.py:205`), parallel self+cross
attention sharing the query (self-attn has NO out proj; outputs are
summed, cross gated by tanh(per-head gate), then projected by attn2's out
proj, `:140-167`), GQA with complex (interleaved) rotary on q/k of the
self branch and q of the cross branch, qk "layer_norm_across_heads"
(LayerNorm over the full inner dim), proportional-attention softmax scale
sqrt(log_{base}(S))/sqrt(d) (`attention_processor.py:3638`), swiglu
LuminaFeedForward with fp32 SiLU (`attention.py:1083`), masked-mean
caption pooling for temb (`embeddings.py:1762`), LuminaLayerNormContinuous
out head.

TPU-first: rotary tables are host-precomputed (cos, sin) pairs; the whole
stack is static-shape.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..embeddings import TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


def get_1d_rotary_cis_np(dim: int, pos, theta: float = 10000.0, linear_factor: float = 1.0,
                         ntk_factor: float = 1.0):
    """(cos, sin) of the complex cis table [S, dim/2] (reference
    embeddings.get_1d_rotary_pos_embed, use_real=False)."""
    if isinstance(pos, int):
        pos = np.arange(pos)
    theta = theta * ntk_factor
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)) / linear_factor
    angles = np.outer(np.asarray(pos, dtype=np.float64), freqs)
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def get_2d_rotary_pos_embed_lumina_np(embed_dim: int, len_h: int, len_w: int,
                                      linear_factor: float = 1.0, ntk_factor: float = 1.0):
    """(cos, sin) [H, W, embed_dim/2] with h/w frequencies interleaved
    (reference embeddings.get_2d_rotary_pos_embed_lumina :1087)."""
    assert embed_dim % 4 == 0
    ch, sh = get_1d_rotary_cis_np(embed_dim // 2, len_h, linear_factor=linear_factor, ntk_factor=ntk_factor)
    cw, sw = get_1d_rotary_cis_np(embed_dim // 2, len_w, linear_factor=linear_factor, ntk_factor=ntk_factor)
    ch = np.broadcast_to(ch[:, None, :, None], (len_h, len_w, embed_dim // 4, 1))
    sh = np.broadcast_to(sh[:, None, :, None], (len_h, len_w, embed_dim // 4, 1))
    cw = np.broadcast_to(cw[None, :, :, None], (len_h, len_w, embed_dim // 4, 1))
    sw = np.broadcast_to(sw[None, :, :, None], (len_h, len_w, embed_dim // 4, 1))
    cos = np.concatenate([ch, cw], axis=-1).reshape(len_h, len_w, embed_dim // 2)
    sin = np.concatenate([sh, sw], axis=-1).reshape(len_h, len_w, embed_dim // 2)
    return cos, sin


def _apply_complex_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Interleaved complex multiply (apply_rotary_emb use_real=False).
    x: [B, S, H, D]; cos/sin: [S, D/2] or [B, S, D/2]."""
    x_f = x.astype(jnp.float32)
    xr = x_f.reshape(*x.shape[:-1], -1, 2)
    x0, x1 = xr[..., 0], xr[..., 1]
    if cos.ndim == 2:
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    else:
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
    out0 = x0 * cos - x1 * sin
    out1 = x1 * cos + x0 * sin
    return jnp.stack([out0, out1], axis=-1).reshape(x.shape).astype(x.dtype)


class _LuminaAttention(Module):
    """GQA attention with across-heads qk LayerNorm; returns [B, S, H, D]
    (no out projection — reference LuminaAttnProcessor2_0)."""

    def __init__(self, query_dim: int, heads: int, dim_head: int, kv_heads: Optional[int] = None,
                 cross_attention_dim: Optional[int] = None, qk_norm: bool = True, with_out: bool = False):
        super().__init__()
        self.heads = heads
        self.kv_heads = kv_heads or heads
        self.dim_head = dim_head
        inner = heads * dim_head
        inner_kv = self.kv_heads * dim_head
        kv_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
        self.to_q = Linear(query_dim, inner, use_bias=False)
        self.to_k = Linear(kv_dim, inner_kv, use_bias=False)
        self.to_v = Linear(kv_dim, inner_kv, use_bias=False)
        self.norm_q = LayerNorm(inner, eps=1e-5) if qk_norm else None
        self.norm_k = LayerNorm(inner_kv, eps=1e-5) if qk_norm else None
        if with_out:
            self.to_out = ModuleList([Linear(inner, query_dim, use_bias=False)])

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, attention_mask,
                 query_rotary_emb=None, key_rotary_emb=None, base_sequence_length=None):
        B, S, _ = hidden_states.shape
        q = self.to_q(params["to_q"], hidden_states)
        k = self.to_k(params["to_k"], encoder_hidden_states)
        v = self.to_v(params["to_v"], encoder_hidden_states)
        if self.norm_q is not None:
            q = self.norm_q(params["norm_q"], q)
            k = self.norm_k(params["norm_k"], k)
        q = q.reshape(B, S, self.heads, self.dim_head)
        k = k.reshape(B, -1, self.kv_heads, self.dim_head)
        v = v.reshape(B, -1, self.kv_heads, self.dim_head)
        if query_rotary_emb is not None:
            q = _apply_complex_rotary(q, *query_rotary_emb)
        if key_rotary_emb is not None:
            k = _apply_complex_rotary(k, *key_rotary_emb)

        if key_rotary_emb is None:
            scale = 1.0 / math.sqrt(self.dim_head)
        elif base_sequence_length is not None:
            scale = math.sqrt(math.log(S, base_sequence_length)) / math.sqrt(self.dim_head)
        else:
            scale = 1.0 / math.sqrt(self.dim_head)

        n_rep = self.heads // self.kv_heads
        if n_rep > 1:
            k = jnp.repeat(k, n_rep, axis=2)
            v = jnp.repeat(v, n_rep, axis=2)
        qT = jnp.transpose(q, (0, 2, 1, 3))
        kT = jnp.transpose(k, (0, 2, 1, 3))
        vT = jnp.transpose(v, (0, 2, 1, 3))
        scores = jnp.einsum("bhqd,bhkd->bhqk", qT, kT) * scale
        big_neg = jnp.finfo(jnp.float32).min
        scores = jnp.where(attention_mask[:, None, None, :].astype(bool), scores, big_neg)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(vT.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vT)
        return jnp.transpose(out, (0, 2, 1, 3))  # [B, S, H, D]


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
        h = self.linear_1(params["linear_1"], x)
        h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
        return self.linear_2(params["linear_2"], h * self.linear_3(params["linear_3"], x))


class _LuminaRMSNormZero(Module):
    def __init__(self, embedding_dim: int, norm_eps: float, affine: bool = True):
        super().__init__()
        self.linear = Linear(min(embedding_dim, 1024), 4 * embedding_dim, use_bias=True)
        self.norm = RMSNorm(embedding_dim, eps=norm_eps)

    def __call__(self, params: Params, x: jax.Array, emb: jax.Array):
        emb = self.linear(params["linear"], jax.nn.silu(emb))
        scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(emb, 4, axis=1)
        x = self.norm(params["norm"], x) * (1 + scale_msa[:, None])
        return x, gate_msa, scale_mlp, gate_mlp


class _LuminaLayerNormContinuous(Module):
    def __init__(self, embedding_dim: int, conditioning_embedding_dim: int, out_dim: int):
        super().__init__()
        self.linear_1 = Linear(conditioning_embedding_dim, embedding_dim, use_bias=True)
        self.norm = LayerNorm(embedding_dim, eps=1e-6, use_scale=False, use_bias=False)
        self.linear_2 = Linear(embedding_dim, out_dim, use_bias=True)

    def __call__(self, params: Params, x: jax.Array, emb: jax.Array) -> jax.Array:
        scale = self.linear_1(params["linear_1"], jax.nn.silu(emb).astype(x.dtype))
        x = self.norm(params.get("norm", {}), x) * (1 + scale)[:, None, :]
        return self.linear_2(params["linear_2"], x)


class _LuminaCombinedTimestepCaptionEmbedding(Module):
    def __init__(self, hidden_size: int, cross_attention_dim: int, frequency_embedding_size: int = 256):
        super().__init__()
        self.time_proj = Timesteps(num_channels=frequency_embedding_size, flip_sin_to_cos=True,
                                   downscale_freq_shift=0.0)
        self.timestep_embedder = TimestepEmbedding(in_channels=frequency_embedding_size,
                                                   time_embed_dim=hidden_size)
        self.caption_embedder = ModuleList([
            LayerNorm(cross_attention_dim),
            Linear(cross_attention_dim, hidden_size, use_bias=True),
        ])

    def __call__(self, params: Params, timestep, caption_feat, caption_mask):
        t_emb = self.timestep_embedder(
            params["timestep_embedder"], self.time_proj({}, timestep).astype(caption_feat.dtype)
        )
        m = caption_mask.astype(caption_feat.dtype)[..., None]
        pooled = jnp.sum(caption_feat * m, axis=1) / jnp.sum(m, axis=1)
        c = self.caption_embedder[0](params["caption_embedder"][0], pooled)
        c = self.caption_embedder[1](params["caption_embedder"][1], c)
        return t_emb + c


class LuminaNextDiTBlock(Module):
    def __init__(self, dim, num_attention_heads, num_kv_heads, multiple_of, ffn_dim_multiplier,
                 norm_eps, qk_norm, cross_attention_dim):
        super().__init__()
        self.head_dim = dim // num_attention_heads
        self.num_heads = num_attention_heads
        self.attn1 = _LuminaAttention(dim, num_attention_heads, self.head_dim,
                                      kv_heads=num_kv_heads, qk_norm=qk_norm)
        self.attn2 = _LuminaAttention(dim, num_attention_heads, self.head_dim, kv_heads=num_kv_heads,
                                      cross_attention_dim=cross_attention_dim, qk_norm=qk_norm, with_out=True)
        self.feed_forward = LuminaFeedForward(dim, int(4 * 2 * dim / 3), multiple_of, ffn_dim_multiplier)
        self.norm1 = _LuminaRMSNormZero(dim, norm_eps, True)
        self.ffn_norm1 = RMSNorm(dim, eps=norm_eps)
        self.norm2 = RMSNorm(dim, eps=norm_eps)
        self.ffn_norm2 = RMSNorm(dim, eps=norm_eps)
        self.norm1_context = RMSNorm(cross_attention_dim, eps=norm_eps)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype)
        params["gate"] = jnp.zeros((self.num_heads,), dtype)
        return params

    def __call__(self, params: Params, hidden_states, attention_mask, image_rotary_emb,
                 encoder_hidden_states, encoder_mask, temb, base_sequence_length=None):
        residual = hidden_states
        norm_hs, gate_msa, scale_mlp, gate_mlp = self.norm1(params["norm1"], hidden_states, temb)
        self_out = self.attn1(
            params["attn1"], norm_hs, norm_hs, attention_mask,
            query_rotary_emb=image_rotary_emb, key_rotary_emb=image_rotary_emb,
            base_sequence_length=base_sequence_length,
        )
        norm_ehs = self.norm1_context(params["norm1_context"], encoder_hidden_states)
        cross_out = self.attn2(
            params["attn2"], norm_hs, norm_ehs, encoder_mask, query_rotary_emb=image_rotary_emb,
        )
        cross_out = cross_out * jnp.tanh(params["gate"]).reshape(1, 1, -1, 1)
        mixed = (self_out + cross_out).reshape(*self_out.shape[:2], -1)
        hidden_states = self.attn2.to_out[0](params["attn2"]["to_out"][0], mixed)
        hidden_states = residual + jnp.tanh(gate_msa)[:, None] * self.norm2(params["norm2"], hidden_states)
        mlp_out = self.feed_forward(
            params["feed_forward"],
            self.ffn_norm1(params["ffn_norm1"], hidden_states) * (1 + scale_mlp[:, None]),
        )
        return hidden_states + jnp.tanh(gate_mlp)[:, None] * self.ffn_norm2(params["ffn_norm2"], mlp_out)


class LuminaNextDiT2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        sample_size: int = 128,
        patch_size: int = 2,
        in_channels: int = 4,
        hidden_size: int = 2304,
        num_layers: int = 32,
        num_attention_heads: int = 32,
        num_kv_heads: Optional[int] = None,
        multiple_of: int = 256,
        ffn_dim_multiplier: Optional[float] = None,
        norm_eps: float = 1e-5,
        learn_sigma: bool = True,
        qk_norm: bool = True,
        cross_attention_dim: int = 2048,
        scaling_factor: float = 1.0,
    ):
        super().__init__()
        self.sample_size = sample_size
        self.patch_size = patch_size
        self.in_channels = in_channels
        self.out_channels = in_channels * 2 if learn_sigma else in_channels
        self.hidden_size = hidden_size
        self.head_dim = hidden_size // num_attention_heads
        self.scaling_factor = scaling_factor

        self.patch_embedder = _LuminaPatchEmbed(patch_size, in_channels, hidden_size)
        self.time_caption_embed = _LuminaCombinedTimestepCaptionEmbedding(
            hidden_size=min(hidden_size, 1024), cross_attention_dim=cross_attention_dim
        )
        self.layers = ModuleList([
            LuminaNextDiTBlock(
                hidden_size, num_attention_heads, num_kv_heads, multiple_of,
                ffn_dim_multiplier, norm_eps, qk_norm, cross_attention_dim,
            )
            for _ in range(num_layers)
        ])
        self.norm_out = _LuminaLayerNormContinuous(
            embedding_dim=hidden_size, conditioning_embedding_dim=min(hidden_size, 1024),
            out_dim=patch_size * patch_size * self.out_channels,
        )

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype)
        params["pad_token"] = jnp.zeros((self.hidden_size,), dtype)
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        timestep: jax.Array,
        encoder_hidden_states: jax.Array,
        encoder_mask: jax.Array,
        image_rotary_emb: Tuple[jax.Array, jax.Array],
        base_sequence_length: Optional[int] = None,
        return_dict: bool = True,
    ):
        B, C, H, W = hidden_states.shape
        p = self.patch_size
        h, w = H // p, W // p
        x, rope = self.patch_embedder(params["patch_embedder"], hidden_states, image_rotary_emb)
        mask = jnp.ones((B, x.shape[1]), dtype=jnp.int32)
        temb = self.time_caption_embed(params["time_caption_embed"], timestep,
                                       encoder_hidden_states, encoder_mask)

        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][i], x, mask, rope, encoder_hidden_states,
                      encoder_mask, temb, base_sequence_length=base_sequence_length)

        x = self.norm_out(params["norm_out"], x, temb)
        x = x.reshape(B, h, w, p, p, self.out_channels)
        output = jnp.transpose(x, (0, 5, 1, 3, 2, 4)).reshape(B, self.out_channels, H, W)
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)


class _LuminaPatchEmbed(Module):
    """Linear patchify + rope-table slice (reference embeddings.py:587)."""

    def __init__(self, patch_size: int, in_channels: int, embed_dim: int):
        super().__init__()
        self.patch_size = patch_size
        self.proj = Linear(patch_size * patch_size * in_channels, embed_dim, use_bias=True)

    def __call__(self, params: Params, x: jax.Array, freqs):
        cos, sin = freqs  # [Hmax, Wmax, D/2]
        B, C, H, W = x.shape
        p = self.patch_size
        h, w = H // p, W // p
        x = x.reshape(B, C, h, p, w, p)
        x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(B, h * w, C * p * p)
        x = self.proj(params["proj"], x)
        rope = (cos[:h, :w].reshape(h * w, -1), sin[:h, :w].reshape(h * w, -1))
        return x, rope
