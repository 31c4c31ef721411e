"""Krea2Transformer2DModel — Krea 2 single-stream GQA MMDiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/transformer_krea2.py:330`):
zero-centered RMSNorms (effective scale `1 + weight`, `:37`), grouped-query
attention with a sigmoid output gate (`:54`), SwiGLU FFs, ONE shared
timestep modulation vector (`time_mod_proj`) plus per-block additive
`scale_shift_table`s (`:216`), and a text-fusion stage that attends across
the tapped text-encoder LAYER axis per token before refining across tokens
(`:167`). Rope theta 1000 over (t, h, w) ids; text rows all-zero.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..embeddings import apply_rotary_emb, get_1d_rotary_pos_embed_np
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class Krea2RMSNorm(Module):
    """Zero-centered scale: multiplier is `1 + weight` (reference `:37`)."""

    def __init__(self, dim: int, eps: float = 1e-5):
        super().__init__()
        self.dim = dim
        self.eps = eps

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"weight": jnp.zeros((self.dim,), dtype)}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps)
        return (xf * (params["weight"].astype(jnp.float32) + 1.0)).astype(dtype)


class Krea2Attention(Module):
    def __init__(self, hidden_size: int, num_heads: int, num_kv_heads: Optional[int] = None,
                 eps: float = 1e-5):
        super().__init__()
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads if num_kv_heads is not None else num_heads
        self.head_dim = hidden_size // num_heads
        self.to_q = Linear(hidden_size, self.head_dim * self.num_heads, use_bias=False)
        self.to_k = Linear(hidden_size, self.head_dim * self.num_kv_heads, use_bias=False)
        self.to_v = Linear(hidden_size, self.head_dim * self.num_kv_heads, use_bias=False)
        self.to_gate = Linear(hidden_size, hidden_size, use_bias=False)
        self.norm_q = Krea2RMSNorm(self.head_dim, eps=eps)
        self.norm_k = Krea2RMSNorm(self.head_dim, eps=eps)
        self.to_out = ModuleList([Linear(hidden_size, hidden_size, use_bias=False)])

    def __call__(self, params: Params, x: jax.Array, attention_mask=None, image_rotary_emb=None):
        b, s, _ = x.shape
        q = self.to_q(params["to_q"], x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.to_k(params["to_k"], x).reshape(b, s, self.num_kv_heads, self.head_dim)
        v = self.to_v(params["to_v"], x).reshape(b, s, self.num_kv_heads, self.head_dim)
        gate = self.to_gate(params["to_gate"], x)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)
        if image_rotary_emb is not None:
            cos, sin = image_rotary_emb
            q = apply_rotary_emb(q, cos, sin)
            k = apply_rotary_emb(k, cos, sin)
        if self.num_kv_heads != self.num_heads:
            rep = self.num_heads // self.num_kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        out = dispatch_attention_fn(q, k, v, attn_mask=attention_mask)
        out = out.reshape(b, s, -1).astype(x.dtype)
        out = out * jax.nn.sigmoid(gate)
        return self.to_out[0](params["to_out"][0], out)


class Krea2SwiGLU(Module):
    def __init__(self, dim: int, hidden_dim: int):
        super().__init__()
        self.gate = Linear(dim, hidden_dim, use_bias=False)
        self.up = Linear(dim, hidden_dim, use_bias=False)
        self.down = Linear(hidden_dim, dim, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.down(params["down"],
                         jax.nn.silu(self.gate(params["gate"], x)) * self.up(params["up"], x))


class Krea2TextFusionBlock(Module):
    def __init__(self, dim: int, num_heads: int, num_kv_heads: int, intermediate_size: int, eps: float):
        super().__init__()
        self.norm1 = Krea2RMSNorm(dim, eps=eps)
        self.norm2 = Krea2RMSNorm(dim, eps=eps)
        self.attn = Krea2Attention(dim, num_heads, num_kv_heads, eps=eps)
        self.ff = Krea2SwiGLU(dim, intermediate_size)

    def __call__(self, params: Params, x: jax.Array, attention_mask=None) -> jax.Array:
        x = x + self.attn(params["attn"], self.norm1(params["norm1"], x), attention_mask=attention_mask)
        return x + self.ff(params["ff"], self.norm2(params["norm2"], x))


class Krea2TextFusion(Module):
    def __init__(self, num_text_layers, dim, num_heads, num_kv_heads, intermediate_size,
                 num_layerwise_blocks, num_refiner_blocks, eps):
        super().__init__()
        self.layerwise_blocks = ModuleList(
            [Krea2TextFusionBlock(dim, num_heads, num_kv_heads, intermediate_size, eps)
             for _ in range(num_layerwise_blocks)])
        self.projector = Linear(num_text_layers, 1, use_bias=False)
        self.refiner_blocks = ModuleList(
            [Krea2TextFusionBlock(dim, num_heads, num_kv_heads, intermediate_size, eps)
             for _ in range(num_refiner_blocks)])

    def __call__(self, params: Params, encoder_hidden_states: jax.Array,
                 attention_mask=None) -> jax.Array:
        b, s, n_layers, d = encoder_hidden_states.shape
        x = encoder_hidden_states.reshape(b * s, n_layers, d)
        for i, block in enumerate(self.layerwise_blocks):
            x = block(params["layerwise_blocks"][i], x)
        x = jnp.transpose(x.reshape(b, s, n_layers, d), (0, 1, 3, 2))
        x = self.projector(params["projector"], x)[..., 0]
        for i, block in enumerate(self.refiner_blocks):
            x = block(params["refiner_blocks"][i], x, attention_mask=attention_mask)
        return x


class Krea2TransformerBlock(Module):
    def __init__(self, hidden_size, intermediate_size, num_heads, num_kv_heads, norm_eps):
        super().__init__()
        self.hidden_size = hidden_size
        self.norm1 = Krea2RMSNorm(hidden_size, eps=norm_eps)
        self.norm2 = Krea2RMSNorm(hidden_size, eps=norm_eps)
        self.attn = Krea2Attention(hidden_size, num_heads, num_kv_heads, eps=norm_eps)
        self.ff = Krea2SwiGLU(hidden_size, intermediate_size)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["scale_shift_table"] = jnp.zeros((6, self.hidden_size), dtype)
        return params

    def __call__(self, params: Params, x, temb_mod, image_rotary_emb, attention_mask=None):
        mod = temb_mod.reshape(*temb_mod.shape[:-1], 6, -1) + params["scale_shift_table"]
        prescale, preshift, pregate, postscale, postshift, postgate = [
            mod[..., i, :] for i in range(6)
        ]
        attn_out = self.attn(
            params["attn"], (1.0 + prescale) * self.norm1(params["norm1"], x) + preshift,
            attention_mask=attention_mask, image_rotary_emb=image_rotary_emb)
        x = x + pregate * attn_out
        ff_out = self.ff(params["ff"], (1.0 + postscale) * self.norm2(params["norm2"], x) + postshift)
        return x + postgate * ff_out


class Krea2TimestepEmbedding(Module):
    def __init__(self, embed_dim: int, hidden_size: int):
        super().__init__()
        self.embed_dim = embed_dim
        self.linear_1 = Linear(embed_dim, hidden_size, use_bias=True)
        self.linear_2 = Linear(hidden_size, hidden_size, use_bias=True)

    def __call__(self, params: Params, timestep: jax.Array, dtype) -> jax.Array:
        half = self.embed_dim // 2
        freqs = jnp.exp(-math.log(1e4) * jnp.arange(half, dtype=jnp.float32) / half)
        args = (timestep.astype(jnp.float32) * 1e3)[:, None, None] * freqs
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1).astype(dtype)
        h = jax.nn.gelu(self.linear_1(params["linear_1"], emb), approximate=True)
        return self.linear_2(params["linear_2"], h)


class Krea2TextProjection(Module):
    def __init__(self, text_dim: int, hidden_size: int, eps: float):
        super().__init__()
        self.norm = Krea2RMSNorm(text_dim, eps=eps)
        self.linear_1 = Linear(text_dim, hidden_size, use_bias=True)
        self.linear_2 = Linear(hidden_size, hidden_size, use_bias=True)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.linear_1(params["linear_1"], self.norm(params["norm"], x))
        return self.linear_2(params["linear_2"], jax.nn.gelu(x, approximate=True))


class Krea2FinalLayer(Module):
    def __init__(self, hidden_size: int, out_channels: int, eps: float):
        super().__init__()
        self.hidden_size = hidden_size
        self.norm = Krea2RMSNorm(hidden_size, eps=eps)
        self.linear = Linear(hidden_size, out_channels, use_bias=True)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["scale_shift_table"] = jnp.zeros((2, self.hidden_size), dtype)
        return params

    def __call__(self, params: Params, x: jax.Array, temb: jax.Array) -> jax.Array:
        mod = temb + params["scale_shift_table"]
        scale, shift = jnp.split(mod, 2, axis=1)
        x = (1.0 + scale) * self.norm(params["norm"], x) + shift
        return self.linear(params["linear"], x)


class Krea2Transformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 64,
        num_layers: int = 28,
        attention_head_dim: int = 128,
        num_attention_heads: int = 48,
        num_key_value_heads: int = 12,
        intermediate_size: int = 16384,
        timestep_embed_dim: int = 256,
        text_hidden_dim: int = 2560,
        num_text_layers: int = 12,
        text_num_attention_heads: int = 20,
        text_num_key_value_heads: int = 20,
        text_intermediate_size: int = 6912,
        num_layerwise_text_blocks: int = 2,
        num_refiner_text_blocks: int = 2,
        axes_dims_rope: Tuple[int, int, int] = (32, 48, 48),
        rope_theta: float = 1000.0,
        norm_eps: float = 1e-5,
    ):
        super().__init__()
        hidden_size = attention_head_dim * num_attention_heads
        if sum(axes_dims_rope) != attention_head_dim:
            raise ValueError("sum(axes_dims_rope) must equal attention_head_dim")
        self.out_channels = in_channels
        self.axes_dims_rope = tuple(axes_dims_rope)

        self.img_in = Linear(in_channels, hidden_size, use_bias=True)
        self.time_embed = Krea2TimestepEmbedding(timestep_embed_dim, hidden_size)
        self.time_mod_proj = Linear(hidden_size, 6 * hidden_size, use_bias=True)
        self.text_fusion = Krea2TextFusion(
            num_text_layers, text_hidden_dim, text_num_attention_heads, text_num_key_value_heads,
            text_intermediate_size, num_layerwise_text_blocks, num_refiner_text_blocks, norm_eps)
        self.txt_in = Krea2TextProjection(text_hidden_dim, hidden_size, eps=norm_eps)
        self.transformer_blocks = ModuleList(
            [Krea2TransformerBlock(hidden_size, intermediate_size, num_attention_heads,
                                   num_key_value_heads, norm_eps) for _ in range(num_layers)])
        self.final_layer = Krea2FinalLayer(hidden_size, in_channels, eps=norm_eps)

    def rotary_emb(self, position_ids: np.ndarray):
        """Host-side rope tables over (t, h, w) ids (reference `:301`)."""
        cos_out, sin_out = [], []
        for i, d in enumerate(self.axes_dims_rope):
            cos, sin = get_1d_rotary_pos_embed_np(
                d, np.asarray(position_ids)[:, i], theta=float(self.config.rope_theta))
            cos_out.append(cos)
            sin_out.append(sin)
        return np.concatenate(cos_out, axis=-1), np.concatenate(sin_out, axis=-1)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, S_img, in_channels] packed latents
        encoder_hidden_states: jax.Array,  # [B, S_txt, num_text_layers, text_hidden_dim]
        timestep: jax.Array,  # [B] in [0, 1]
        position_ids: Optional[np.ndarray] = None,
        image_rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
        return_dict: bool = True,
    ) -> Union[Transformer2DModelOutput, tuple]:
        batch_size, image_seq_len, _ = hidden_states.shape
        text_seq_len = encoder_hidden_states.shape[1]

        temb = self.time_embed(params["time_embed"], timestep, hidden_states.dtype)
        temb_mod = self.time_mod_proj(params["time_mod_proj"], jax.nn.gelu(temb, approximate=True))

        text_attention_mask = None
        attention_mask = None
        if encoder_attention_mask is not None:
            text_attention_mask = encoder_attention_mask[:, None, None, :].astype(bool)
            img_valid = jnp.ones((batch_size, image_seq_len), dtype=bool)
            attention_mask = jnp.concatenate(
                [encoder_attention_mask.astype(bool), img_valid], axis=1)[:, None, None, :]

        ctx = self.text_fusion(params["text_fusion"], encoder_hidden_states,
                               attention_mask=text_attention_mask)
        ctx = self.txt_in(params["txt_in"], ctx)

        x = self.img_in(params["img_in"], hidden_states)
        x = jnp.concatenate([ctx, x], axis=1)

        if image_rotary_emb is None:
            cos, sin = self.rotary_emb(position_ids)
            image_rotary_emb = (jnp.asarray(cos), jnp.asarray(sin))

        for i, block in enumerate(self.transformer_blocks):
            x = block(params["transformer_blocks"][i], x, temb_mod, image_rotary_emb, attention_mask)

        x = x[:, text_seq_len:]
        output = self.final_layer(params["final_layer"], x, temb)

        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)
