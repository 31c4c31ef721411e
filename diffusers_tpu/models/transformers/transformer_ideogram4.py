"""Ideogram4Transformer2DModel — Ideogram 4 packed-sequence flow DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_ideogram4.py:278`):
ONE packed sequence holds text-conditioning tokens and patchified image
latents, tagged by per-token indicators; interleaved multi-axis MRoPE
(`:50` — h/w frequencies interleaved into slots 1,2 mod 3, image positions
offset by 65536); per-block 4-param AdaLN with tanh gates applied through a
POST-attention RMSNorm (`:186`); block-diagonal segment attention mask.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Embedding, LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin

SEQUENCE_PADDING_INDICATOR = -1
OUTPUT_IMAGE_INDICATOR = 2
LLM_TOKEN_INDICATOR = 3
IMAGE_POSITION_OFFSET = 65536


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


class Ideogram4MRoPE:
    """Interleaved (t, h, w) rope (reference Ideogram4MRoPE :50). The angle
    matmul runs in float32 — image positions start at 65536 and bfloat16
    would collapse consecutive integers there."""

    def __init__(self, head_dim: int, base: float, mrope_section):
        self.inv_freq = 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
        self.mrope_section = tuple(mrope_section)

    def __call__(self, position_ids) -> Tuple[jax.Array, jax.Array]:
        # position_ids: [B, L, 3] (host numpy or device); computed host-side in float64
        pos = np.asarray(position_ids, dtype=np.float64)  # [B, L, 3]
        # [3, B, L, F]
        freqs = np.stack([pos[..., i, None] * self.inv_freq[None, None, :] for i in range(3)], axis=0)
        freqs_t = freqs[0].copy()
        for axis, offset in ((1, 1), (2, 2)):
            length = self.mrope_section[axis] * 3
            idx = np.arange(offset, length, 3)
            freqs_t[..., idx] = freqs[axis][..., idx]
        emb = np.concatenate([freqs_t, freqs_t], axis=-1)
        return (jnp.asarray(np.cos(emb), jnp.float32), jnp.asarray(np.sin(emb), jnp.float32))


class Ideogram4Attention(Module):
    def __init__(self, hidden_size: int, num_heads: int, eps: float = 1e-5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = hidden_size // num_heads
        self.to_q = Linear(hidden_size, hidden_size, use_bias=False)
        self.to_k = Linear(hidden_size, hidden_size, use_bias=False)
        self.to_v = Linear(hidden_size, hidden_size, use_bias=False)
        self.norm_q = RMSNorm(self.head_dim, eps=eps)
        self.norm_k = RMSNorm(self.head_dim, eps=eps)
        self.to_out = ModuleList([Linear(hidden_size, hidden_size, use_bias=False)])

    def __call__(self, params: Params, x: jax.Array, attention_mask, image_rotary_emb):
        b, s, _ = x.shape
        q = self.to_q(params["to_q"], x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.to_k(params["to_k"], x).reshape(b, s, self.num_heads, self.head_dim)
        v = self.to_v(params["to_v"], x).reshape(b, s, self.num_heads, self.head_dim)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)
        cos, sin = image_rotary_emb
        cos = cos[:, :, None, :].astype(q.dtype)
        sin = sin[:, :, None, :].astype(q.dtype)
        q = q * cos + _rotate_half(q) * sin
        k = k * cos + _rotate_half(k) * sin
        out = dispatch_attention_fn(q, k, v, attn_mask=attention_mask)
        out = out.reshape(b, s, -1).astype(q.dtype)
        return self.to_out[0](params["to_out"][0], out)


class Ideogram4MLP(Module):
    def __init__(self, dim: int, hidden_dim: int):
        super().__init__()
        self.w1 = Linear(dim, hidden_dim, use_bias=False)
        self.w2 = Linear(hidden_dim, dim, use_bias=False)
        self.w3 = Linear(dim, hidden_dim, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.w2(params["w2"],
                       jax.nn.silu(self.w1(params["w1"], x)) * self.w3(params["w3"], x))


class Ideogram4TransformerBlock(Module):
    def __init__(self, hidden_size: int, intermediate_size: int, num_heads: int,
                 norm_eps: float, adaln_dim: int):
        super().__init__()
        self.attention = Ideogram4Attention(hidden_size, num_heads, eps=1e-5)
        self.feed_forward = Ideogram4MLP(hidden_size, intermediate_size)
        self.attention_norm1 = RMSNorm(hidden_size, eps=norm_eps)
        self.ffn_norm1 = RMSNorm(hidden_size, eps=norm_eps)
        self.attention_norm2 = RMSNorm(hidden_size, eps=norm_eps)
        self.ffn_norm2 = RMSNorm(hidden_size, eps=norm_eps)
        self.adaln_modulation = Linear(adaln_dim, 4 * hidden_size, use_bias=True)

    def __call__(self, params: Params, x, attention_mask, image_rotary_emb, adaln_input):
        mod = self.adaln_modulation(params["adaln_modulation"], adaln_input)
        scale_msa, gate_msa, scale_mlp, gate_mlp = jnp.split(mod, 4, axis=-1)
        gate_msa = jnp.tanh(gate_msa)
        gate_mlp = jnp.tanh(gate_mlp)
        attn_out = self.attention(
            params["attention"],
            self.attention_norm1(params["attention_norm1"], x) * (1.0 + scale_msa),
            attention_mask, image_rotary_emb)
        x = x + gate_msa * self.attention_norm2(params["attention_norm2"], attn_out)
        ff = self.feed_forward(params["feed_forward"],
                               self.ffn_norm1(params["ffn_norm1"], x) * (1.0 + scale_mlp))
        return x + gate_mlp * self.ffn_norm2(params["ffn_norm2"], ff)


def _sinusoidal_embedding(t: jax.Array, dim: int, scale: float = 1e4) -> jax.Array:
    t = t.astype(jnp.float32)
    half = dim // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(math.log(scale) / (half - 1)))
    emb = t[..., None] * freq
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


class Ideogram4EmbedScalar(Module):
    def __init__(self, dim: int, input_range: Tuple[float, float]):
        super().__init__()
        self.dim = dim
        self.range_min, self.range_max = input_range
        self.mlp_in = Linear(dim, dim, use_bias=True)
        self.mlp_out = Linear(dim, dim, use_bias=True)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        in_dtype = x.dtype
        scaled = 1e4 * (x.astype(jnp.float32) - self.range_min) / (self.range_max - self.range_min)
        emb = _sinusoidal_embedding(scaled, self.dim).astype(in_dtype)
        emb = jax.nn.silu(self.mlp_in(params["mlp_in"], emb))
        return self.mlp_out(params["mlp_out"], emb)


class Ideogram4FinalLayer(Module):
    def __init__(self, hidden_size: int, out_channels: int, adaln_dim: int):
        super().__init__()
        self.norm_final = LayerNorm(hidden_size, eps=1e-6, use_scale=False, use_bias=False)
        self.linear = Linear(hidden_size, out_channels, use_bias=True)
        self.adaln_modulation = Linear(adaln_dim, hidden_size, use_bias=True)

    def __call__(self, params: Params, x: jax.Array, conditioning: jax.Array) -> jax.Array:
        scale = 1.0 + self.adaln_modulation(params["adaln_modulation"], jax.nn.silu(conditioning))
        return self.linear(params["linear"], self.norm_final({}, x) * scale)


class Ideogram4Transformer2DModel(Module, ModelMixin, ConfigMixin):
    """Ideogram 4 packed text+image DiT (reference :278)."""

    @register_to_config
    def __init__(
        self,
        in_channels: int = 128,
        num_layers: int = 34,
        attention_head_dim: int = 256,
        num_attention_heads: int = 18,
        intermediate_size: int = 12288,
        adaln_dim: int = 512,
        llm_features_dim: int = 53248,
        rope_theta: int = 5_000_000,
        mrope_section: Tuple[int, int, int] = (24, 20, 20),
        norm_eps: float = 1e-5,
    ):
        super().__init__()
        hidden_size = attention_head_dim * num_attention_heads
        self.hidden_size = hidden_size
        self.input_proj = Linear(in_channels, hidden_size, use_bias=True)
        self.llm_cond_norm = RMSNorm(llm_features_dim, eps=1e-6)
        self.llm_cond_proj = Linear(llm_features_dim, hidden_size, use_bias=True)
        self.t_embedding = Ideogram4EmbedScalar(hidden_size, input_range=(0.0, 1.0))
        self.adaln_proj = Linear(hidden_size, adaln_dim, use_bias=True)
        self.embed_image_indicator = Embedding(2, hidden_size)
        self.rotary_emb = Ideogram4MRoPE(head_dim=attention_head_dim, base=rope_theta,
                                         mrope_section=mrope_section)
        self.layers = ModuleList([
            Ideogram4TransformerBlock(hidden_size, intermediate_size, num_attention_heads,
                                      norm_eps, adaln_dim)
            for _ in range(num_layers)
        ])
        self.final_layer = Ideogram4FinalLayer(hidden_size, in_channels, adaln_dim)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, L, in_channels] packed
        timestep: jax.Array,  # [B] or [B, L], model time in [0, 1]
        encoder_hidden_states: jax.Array,  # [B, L, llm_features_dim]
        position_ids,  # [B, L, 3] host numpy ok
        segment_ids: jax.Array,  # [B, L]
        indicator: jax.Array,  # [B, L]
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        return_dict: bool = True,
    ):
        dtype = hidden_states.dtype
        llm_mask = (indicator == LLM_TOKEN_INDICATOR).astype(dtype)[..., None]
        img_mask = (indicator == OUTPUT_IMAGE_INDICATOR).astype(dtype)[..., None]

        encoder_hidden_states = encoder_hidden_states * llm_mask
        hidden_states = hidden_states * img_mask
        hidden_states = self.input_proj(params["input_proj"], hidden_states) * img_mask

        t_cond = self.t_embedding(params["t_embedding"], timestep.astype(dtype))
        if timestep.ndim == 1:
            t_cond = t_cond[:, None]
        adaln_input = jax.nn.silu(self.adaln_proj(params["adaln_proj"], t_cond))

        ehs = self.llm_cond_norm(params["llm_cond_norm"], encoder_hidden_states)
        ehs = self.llm_cond_proj(params["llm_cond_proj"], ehs) * llm_mask
        hidden_states = hidden_states + ehs
        hidden_states = hidden_states + self.embed_image_indicator(
            params["embed_image_indicator"], (indicator == OUTPUT_IMAGE_INDICATOR).astype(jnp.int32))

        if image_rotary_emb is None:
            image_rotary_emb = self.rotary_emb(position_ids)

        attention_mask = (segment_ids[:, :, None] == segment_ids[:, None, :])[:, None]

        for i, block in enumerate(self.layers):
            hidden_states = block(params["layers"][i], hidden_states, attention_mask,
                                  image_rotary_emb, adaln_input)

        output = self.final_layer(params["final_layer"], hidden_states, adaln_input)
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)
