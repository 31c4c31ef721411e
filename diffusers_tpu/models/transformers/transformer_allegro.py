"""AllegroTransformer3DModel.

Behavioral mirror of the reference
`models/transformers/transformer_allegro.py`: PixArt-style blocks with a
per-block scale_shift_table + AdaLN-single timestep (`:36`), 3-axis
Allegro rotary — head_dim split into t/h/w thirds, each rotated
half-split with per-token position gathers (`embeddings.py:1244`),
pre-LN self-attention (affine-free), UN-normalized cross-attention
(`:148` — the reference feeds hidden_states straight into attn2), 2-way
scale-shift out head, per-frame PatchEmbed without a positional table.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import PatchEmbed, PixArtAlphaTextProjection, get_1d_rotary_pos_embed_np
from ..modeling_utils import ModelMixin
from .pixart_transformer_2d import AdaLayerNormSingle


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


def get_3d_rotary_pos_embed_allegro_np(embed_dim: int, grid_size, temporal_size: int,
                                       interpolation_scale=(1.0, 1.0, 1.0), theta: float = 10000.0):
    """Gathered (cos, sin) per axis, flattened to the [T*H*W] token order of
    `torch.cartesian_prod(t, h, w)` (reference embeddings.py:932 + pipeline
    gather). Returns ((t_cos,t_sin),(h_cos,h_sin),(w_cos,w_sin)) each
    [N, embed_dim//3]."""
    gh, gw = grid_size
    it, ih, iw = interpolation_scale
    dim = embed_dim // 3
    t_cos, t_sin = get_1d_rotary_pos_embed_np(dim, np.arange(temporal_size) / it, theta=theta,
                                              repeat_interleave_real=False)
    h_cos, h_sin = get_1d_rotary_pos_embed_np(dim, np.arange(gh) / ih, theta=theta,
                                              repeat_interleave_real=False)
    w_cos, w_sin = get_1d_rotary_pos_embed_np(dim, np.arange(gw) / iw, theta=theta,
                                              repeat_interleave_real=False)
    tt, hh, ww = np.meshgrid(np.arange(temporal_size), np.arange(gh), np.arange(gw), indexing="ij")
    pos_t, pos_h, pos_w = tt.reshape(-1), hh.reshape(-1), ww.reshape(-1)
    return ((t_cos[pos_t], t_sin[pos_t]), (h_cos[pos_h], h_sin[pos_h]), (w_cos[pos_w], w_sin[pos_w]))


def _apply_allegro_rope(x: jax.Array, rope) -> jax.Array:
    """x: [B, H, S, D]; rope: 3 gathered (cos, sin) pairs each [S, D/3]."""

    def rot(tokens, cos, sin):
        x1, x2 = jnp.split(tokens.astype(jnp.float32), 2, axis=-1)
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        return (tokens.astype(jnp.float32) * cos[None, None] + rotated * sin[None, None]).astype(tokens.dtype)

    t, h, w = jnp.split(x, 3, axis=-1)
    (tc, ts), (hc, hs), (wc, ws) = rope
    return jnp.concatenate([rot(t, tc, ts), rot(h, hc, hs), rot(w, wc, ws)], axis=-1)


class _AllegroAttention(Module):
    def __init__(self, query_dim, heads, dim_head, cross_attention_dim=None, bias=True):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        kv_dim = cross_attention_dim if cross_attention_dim is not None else query_dim
        self.to_q = Linear(query_dim, inner, use_bias=bias)
        self.to_k = Linear(kv_dim, inner, use_bias=bias)
        self.to_v = Linear(kv_dim, inner, use_bias=bias)
        self.to_out = ModuleList([Linear(inner, query_dim, use_bias=True)])

    def __call__(self, params, x, encoder_hidden_states=None, additive_mask=None, rope=None):
        B, S, _ = x.shape
        kv_src = encoder_hidden_states if encoder_hidden_states is not None else x
        q = self.to_q(params["to_q"], x).reshape(B, S, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], kv_src).reshape(B, -1, self.heads, self.dim_head)
        v = self.to_v(params["to_v"], kv_src).reshape(B, -1, self.heads, self.dim_head)
        q = jnp.transpose(q, (0, 2, 1, 3))
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))
        if rope is not None and encoder_hidden_states is None:
            q = _apply_allegro_rope(q, rope)
            k = _apply_allegro_rope(k, rope)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(self.dim_head, q.dtype))
        if additive_mask is not None:
            scores = scores + additive_mask.astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, S, -1)
        return self.to_out[0](params["to_out"][0], out)


class AllegroTransformerBlock(Module):
    def __init__(self, dim, num_attention_heads, attention_head_dim, cross_attention_dim,
                 activation_fn="gelu-approximate", attention_bias=True,
                 norm_elementwise_affine=False, norm_eps=1e-6):
        super().__init__()
        self.dim = dim
        aff = norm_elementwise_affine
        self.norm1 = LayerNorm(dim, eps=norm_eps, use_scale=aff, use_bias=aff)
        self.attn1 = _AllegroAttention(dim, num_attention_heads, attention_head_dim, bias=attention_bias)
        self.norm2 = LayerNorm(dim, eps=norm_eps, use_scale=aff, use_bias=aff)
        self.attn2 = _AllegroAttention(dim, num_attention_heads, attention_head_dim,
                                       cross_attention_dim=cross_attention_dim, bias=attention_bias)
        self.norm3 = LayerNorm(dim, eps=norm_eps, use_scale=aff, use_bias=aff)
        self.ff = FeedForward(dim, activation_fn=activation_fn)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype)
        params["scale_shift_table"] = jax.random.normal(key, (6, self.dim), dtype) / self.dim**0.5
        return params

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb,
                 encoder_additive_mask=None, rope=None):
        B = hidden_states.shape[0]
        mods = params["scale_shift_table"][None] + temb.reshape(B, 6, -1)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            m[:, 0][:, None, :] for m in jnp.split(mods, 6, axis=1)
        ]
        norm_hs = self.norm1(params.get("norm1", {}), hidden_states)
        norm_hs = norm_hs * (1 + scale_msa) + shift_msa
        attn_out = self.attn1(params["attn1"], norm_hs, rope=rope)
        hidden_states = hidden_states + gate_msa * attn_out

        # cross-attention reads the UN-normalized stream (reference :148)
        attn_out = self.attn2(params["attn2"], hidden_states,
                              encoder_hidden_states=encoder_hidden_states,
                              additive_mask=encoder_additive_mask)
        hidden_states = hidden_states + attn_out

        norm_hs = self.norm2(params.get("norm2", {}), hidden_states)
        norm_hs = norm_hs * (1 + scale_mlp) + shift_mlp
        hidden_states = hidden_states + gate_mlp * self.ff(params["ff"], norm_hs)
        return hidden_states


class AllegroTransformer3DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        patch_size: int = 2,
        patch_size_t: int = 1,
        num_attention_heads: int = 24,
        attention_head_dim: int = 96,
        in_channels: int = 4,
        out_channels: int = 4,
        num_layers: int = 32,
        dropout: float = 0.0,
        cross_attention_dim: int = 2304,
        attention_bias: bool = True,
        sample_height: int = 90,
        sample_width: int = 160,
        sample_frames: int = 22,
        activation_fn: str = "gelu-approximate",
        norm_elementwise_affine: bool = False,
        norm_eps: float = 1e-6,
        caption_channels: int = 4096,
        interpolation_scale_h: float = 2.0,
        interpolation_scale_w: float = 2.0,
        interpolation_scale_t: float = 2.2,
    ):
        super().__init__()
        self.inner_dim = num_attention_heads * attention_head_dim
        self.pos_embed = PatchEmbed(
            height=sample_height, width=sample_width, patch_size=patch_size,
            in_channels=in_channels, embed_dim=self.inner_dim, pos_embed_type=None,
        )
        self.transformer_blocks = ModuleList([
            AllegroTransformerBlock(
                self.inner_dim, num_attention_heads, attention_head_dim,
                cross_attention_dim=cross_attention_dim, activation_fn=activation_fn,
                attention_bias=attention_bias, norm_elementwise_affine=norm_elementwise_affine,
                norm_eps=norm_eps,
            )
            for _ in range(num_layers)
        ])
        self.norm_out = LayerNorm(self.inner_dim, eps=1e-6, use_scale=False, use_bias=False)
        self.proj_out = Linear(self.inner_dim, patch_size * patch_size * out_channels)
        self.adaln_single = AdaLayerNormSingle(self.inner_dim, use_additional_conditions=False)
        self.caption_projection = PixArtAlphaTextProjection(
            in_features=caption_channels, hidden_size=self.inner_dim
        )

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype)
        params["scale_shift_table"] = jax.random.normal(key, (2, self.inner_dim), dtype) / self.inner_dim**0.5
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        encoder_hidden_states: jax.Array,
        timestep: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
        image_rotary_emb=None,
        return_dict: bool = True,
    ):
        B, C, F, H, W = hidden_states.shape
        p = self.config.patch_size
        p_t = self.config.patch_size_t

        enc_mask = None
        if encoder_attention_mask is not None and encoder_attention_mask.ndim == 2:
            enc_mask = ((1 - encoder_attention_mask.astype(jnp.float32)) * -10000.0)[:, None, None, :]

        temb, embedded_timestep = self.adaln_single(
            params["adaln_single"], jnp.atleast_1d(jnp.asarray(timestep)),
            batch_size=B, dtype=hidden_states.dtype,
        )

        x = jnp.transpose(hidden_states, (0, 2, 1, 3, 4)).reshape(B * F, C, H, W)
        x = self.pos_embed(params["pos_embed"], x)
        x = x.reshape(B, F * x.shape[1], -1)

        ehs = self.caption_projection(params["caption_projection"], encoder_hidden_states)
        ehs = ehs.reshape(B, -1, ehs.shape[-1])

        for i, block in enumerate(self.transformer_blocks):
            x = block(params["transformer_blocks"][i], x, ehs, temb,
                      encoder_additive_mask=enc_mask, rope=image_rotary_emb)

        mods = params["scale_shift_table"][None] + embedded_timestep[:, None]
        shift, scale = [m[:, 0][:, None, :] for m in jnp.split(mods, 2, axis=1)]
        x = self.norm_out(params.get("norm_out", {}), x)
        x = x * (1 + scale) + shift
        x = self.proj_out(params["proj_out"], x)

        pf, ph, pw = F // p_t, H // p, W // p
        x = x.reshape(B, pf, ph, pw, p_t, p, p, -1)
        x = jnp.transpose(x, (0, 7, 1, 4, 2, 5, 3, 6))
        output = x.reshape(B, -1, F, H, W)
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)
