"""Flux2Transformer2DModel.

Behavioral mirror of the reference
`models/transformers/transformer_flux2.py`: bias-free everything, fused
SwiGLU FF (`Flux2SwiGLU` `:284` — gate folded into linear_in's doubled
output), dual-stream blocks with per-head RMS qk and joint [txt, img]
attention (`:856`), ViT-22B-style parallel single-stream blocks with one
fused qkv+mlp-in projection and one fused out projection (`:709`),
SHARED per-stage modulation MLPs (`Flux2Modulation` `:1016` — one for all
double-img, one for all double-txt, one for all single blocks),
4-axis repeat-interleaved rotary at theta=2000 (`:951`), AdaLN-continuous
out. The KV-cache reference-image editing path is not replicated —
multi-reference conditioning concatenates ref tokens into
`hidden_states` instead.
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
from ..embeddings import (
    TimestepEmbedding,
    Timesteps,
    apply_rotary_emb,
    get_1d_rotary_pos_embed,
)
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNormContinuous


@dataclass
class Flux2Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class Flux2FeedForward(Module):
    def __init__(self, dim: int, dim_out: Optional[int] = None, mult: float = 3.0,
                 inner_dim: Optional[int] = None, bias: bool = False):
        super().__init__()
        if inner_dim is None:
            inner_dim = int(dim * mult)
        dim_out = dim_out or dim
        self.linear_in = Linear(dim, inner_dim * 2, use_bias=bias)
        self.linear_out = Linear(inner_dim, dim_out, use_bias=bias)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.linear_in(params["linear_in"], x)
        half = x.shape[-1] // 2
        x = jax.nn.silu(x[..., :half]) * x[..., half:]
        return self.linear_out(params["linear_out"], x)


class Flux2Attention(Module):
    def __init__(self, query_dim: int, heads: int, dim_head: int, bias: bool = False,
                 added_kv_proj_dim: Optional[int] = None, added_proj_bias: bool = False,
                 out_bias: bool = False, eps: float = 1e-5):
        super().__init__()
        self.heads = heads
        self.head_dim = dim_head
        inner = heads * dim_head
        self.added_kv_proj_dim = added_kv_proj_dim
        self.to_q = Linear(query_dim, inner, use_bias=bias)
        self.to_k = Linear(query_dim, inner, use_bias=bias)
        self.to_v = Linear(query_dim, inner, use_bias=bias)
        self.norm_q = RMSNorm(dim_head, eps=eps)
        self.norm_k = RMSNorm(dim_head, eps=eps)
        self.to_out = ModuleList([Linear(inner, query_dim, use_bias=out_bias)])
        if added_kv_proj_dim is not None:
            self.norm_added_q = RMSNorm(dim_head, eps=eps)
            self.norm_added_k = RMSNorm(dim_head, eps=eps)
            self.add_q_proj = Linear(added_kv_proj_dim, inner, use_bias=added_proj_bias)
            self.add_k_proj = Linear(added_kv_proj_dim, inner, use_bias=added_proj_bias)
            self.add_v_proj = Linear(added_kv_proj_dim, inner, use_bias=added_proj_bias)
            self.to_add_out = Linear(inner, query_dim, use_bias=out_bias)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states=None,
                 image_rotary_emb=None):
        B, S_img, _ = hidden_states.shape
        q = self.to_q(params["to_q"], hidden_states).reshape(B, S_img, self.heads, self.head_dim)
        k = self.to_k(params["to_k"], hidden_states).reshape(B, S_img, self.heads, self.head_dim)
        v = self.to_v(params["to_v"], hidden_states).reshape(B, S_img, self.heads, self.head_dim)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)

        S_txt = 0
        if self.added_kv_proj_dim is not None and encoder_hidden_states is not None:
            S_txt = encoder_hidden_states.shape[1]
            eq = self.add_q_proj(params["add_q_proj"], encoder_hidden_states).reshape(B, S_txt, self.heads, self.head_dim)
            ek = self.add_k_proj(params["add_k_proj"], encoder_hidden_states).reshape(B, S_txt, self.heads, self.head_dim)
            ev = self.add_v_proj(params["add_v_proj"], encoder_hidden_states).reshape(B, S_txt, self.heads, self.head_dim)
            eq = self.norm_added_q(params["norm_added_q"], eq)
            ek = self.norm_added_k(params["norm_added_k"], ek)
            q = jnp.concatenate([eq, q], axis=1)
            k = jnp.concatenate([ek, k], axis=1)
            v = jnp.concatenate([ev, v], axis=1)

        if image_rotary_emb is not None:
            cos, sin = image_rotary_emb
            q = apply_rotary_emb(q, cos, sin)
            k = apply_rotary_emb(k, cos, sin)

        qT = jnp.transpose(q, (0, 2, 1, 3))
        kT = jnp.transpose(k, (0, 2, 1, 3))
        vT = jnp.transpose(v, (0, 2, 1, 3))
        scores = jnp.einsum("bhqd,bhkd->bhqk", qT, kT) / math.sqrt(self.head_dim)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(vT.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vT)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, -1, self.heads * self.head_dim)

        if encoder_hidden_states is not None and self.added_kv_proj_dim is not None:
            enc_out, img_out = out[:, :S_txt], out[:, S_txt:]
            enc_out = self.to_add_out(params["to_add_out"], enc_out)
            img_out = self.to_out[0](params["to_out"][0], img_out)
            return img_out, enc_out
        return self.to_out[0](params["to_out"][0], out)


class Flux2ParallelSelfAttention(Module):
    """Fused qkv+mlp-in / attn-out+mlp-out parallel block (reference :709)."""

    def __init__(self, query_dim: int, heads: int, dim_head: int, bias: bool = False,
                 out_bias: bool = False, eps: float = 1e-5, mlp_ratio: float = 4.0,
                 mlp_mult_factor: int = 2):
        super().__init__()
        self.heads = heads
        self.head_dim = dim_head
        self.inner_dim = heads * dim_head
        self.mlp_hidden_dim = int(query_dim * mlp_ratio)
        self.mlp_mult_factor = mlp_mult_factor
        self.to_qkv_mlp_proj = Linear(
            query_dim, self.inner_dim * 3 + self.mlp_hidden_dim * mlp_mult_factor, use_bias=bias
        )
        self.norm_q = RMSNorm(dim_head, eps=eps)
        self.norm_k = RMSNorm(dim_head, eps=eps)
        self.to_out = Linear(self.inner_dim + self.mlp_hidden_dim, query_dim, use_bias=out_bias)

    def __call__(self, params: Params, hidden_states, image_rotary_emb=None):
        B, S, _ = hidden_states.shape
        h = self.to_qkv_mlp_proj(params["to_qkv_mlp_proj"], hidden_states)
        qkv, mlp = jnp.split(h, [3 * self.inner_dim], axis=-1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = self.norm_q(params["norm_q"], q.reshape(B, S, self.heads, self.head_dim))
        k = self.norm_k(params["norm_k"], k.reshape(B, S, self.heads, self.head_dim))
        v = v.reshape(B, S, self.heads, self.head_dim)
        if image_rotary_emb is not None:
            cos, sin = image_rotary_emb
            q = apply_rotary_emb(q, cos, sin)
            k = apply_rotary_emb(k, cos, sin)
        qT = jnp.transpose(q, (0, 2, 1, 3))
        kT = jnp.transpose(k, (0, 2, 1, 3))
        vT = jnp.transpose(v, (0, 2, 1, 3))
        scores = jnp.einsum("bhqd,bhkd->bhqk", qT, kT) / math.sqrt(self.head_dim)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(vT.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, vT)
        attn = jnp.transpose(attn, (0, 2, 1, 3)).reshape(B, S, self.inner_dim)

        half = mlp.shape[-1] // 2
        mlp = jax.nn.silu(mlp[..., :half]) * mlp[..., half:]
        return self.to_out(params["to_out"], jnp.concatenate([attn, mlp], axis=-1))


def _split_mod(mod: jax.Array, sets: int):
    if mod.ndim == 2:
        mod = mod[:, None]
    parts = jnp.split(mod, 3 * sets, axis=-1)
    return tuple(tuple(parts[3 * i:3 * (i + 1)]) for i in range(sets))


class Flux2SingleTransformerBlock(Module):
    def __init__(self, dim, num_attention_heads, attention_head_dim, mlp_ratio=3.0,
                 eps=1e-6, bias=False):
        super().__init__()
        self.norm = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.attn = Flux2ParallelSelfAttention(
            dim, num_attention_heads, attention_head_dim, bias=bias, out_bias=bias,
            eps=eps, mlp_ratio=mlp_ratio, mlp_mult_factor=2,
        )

    def __call__(self, params: Params, hidden_states, temb_mod, image_rotary_emb=None):
        (shift, scale, gate), = _split_mod(temb_mod, 1)
        norm_hs = self.norm({}, hidden_states)
        norm_hs = (1 + scale) * norm_hs + shift
        attn_out = self.attn(params["attn"], norm_hs, image_rotary_emb=image_rotary_emb)
        return hidden_states + gate * attn_out


class Flux2TransformerBlock(Module):
    def __init__(self, dim, num_attention_heads, attention_head_dim, mlp_ratio=3.0,
                 eps=1e-6, bias=False):
        super().__init__()
        self.norm1 = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.norm1_context = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.attn = Flux2Attention(
            dim, num_attention_heads, attention_head_dim, bias=bias, added_kv_proj_dim=dim,
            added_proj_bias=bias, out_bias=bias, eps=eps,
        )
        self.norm2 = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.ff = Flux2FeedForward(dim, dim, mult=mlp_ratio, bias=bias)
        self.norm2_context = LayerNorm(dim, eps=eps, use_scale=False, use_bias=False)
        self.ff_context = Flux2FeedForward(dim, dim, mult=mlp_ratio, bias=bias)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states,
                 temb_mod_img, temb_mod_txt, image_rotary_emb=None):
        (shift_msa, scale_msa, gate_msa), (shift_mlp, scale_mlp, gate_mlp) = _split_mod(temb_mod_img, 2)
        (c_shift_msa, c_scale_msa, c_gate_msa), (c_shift_mlp, c_scale_mlp, c_gate_mlp) = _split_mod(temb_mod_txt, 2)

        norm_hs = (1 + scale_msa) * self.norm1({}, hidden_states) + shift_msa
        norm_ehs = (1 + c_scale_msa) * self.norm1_context({}, encoder_hidden_states) + c_shift_msa

        attn_out, ctx_attn_out = self.attn(params["attn"], norm_hs, norm_ehs, image_rotary_emb)

        hidden_states = hidden_states + gate_msa * attn_out
        norm_hs = self.norm2({}, hidden_states) * (1 + scale_mlp) + shift_mlp
        hidden_states = hidden_states + gate_mlp * self.ff(params["ff"], norm_hs)

        encoder_hidden_states = encoder_hidden_states + c_gate_msa * ctx_attn_out
        norm_ehs = self.norm2_context({}, encoder_hidden_states) * (1 + c_scale_mlp) + c_shift_mlp
        encoder_hidden_states = encoder_hidden_states + c_gate_mlp * self.ff_context(params["ff_context"], norm_ehs)
        return encoder_hidden_states, hidden_states


class _Flux2Modulation(Module):
    def __init__(self, dim: int, mod_param_sets: int = 2, bias: bool = False):
        super().__init__()
        self.linear = Linear(dim, dim * 3 * mod_param_sets, use_bias=bias)

    def __call__(self, params: Params, temb: jax.Array) -> jax.Array:
        return self.linear(params["linear"], jax.nn.silu(temb))


class _Flux2TimestepGuidanceEmbeddings(Module):
    def __init__(self, in_channels=256, embedding_dim=6144, bias=False, guidance_embeds=True):
        super().__init__()
        self.time_proj = Timesteps(num_channels=in_channels, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=in_channels, time_embed_dim=embedding_dim,
                                                   sample_proj_bias=bias)
        self.guidance_embedder = (
            TimestepEmbedding(in_channels=in_channels, time_embed_dim=embedding_dim, sample_proj_bias=bias)
            if guidance_embeds else None
        )

    def __call__(self, params, timestep, guidance):
        t_emb = self.timestep_embedder(params["timestep_embedder"], self.time_proj({}, timestep))
        if guidance is not None and self.guidance_embedder is not None:
            g_emb = self.guidance_embedder(params["guidance_embedder"], self.time_proj({}, guidance))
            return t_emb + g_emb
        return t_emb


class Flux2Transformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        patch_size: int = 1,
        in_channels: int = 128,
        out_channels: Optional[int] = None,
        num_layers: int = 8,
        num_single_layers: int = 48,
        attention_head_dim: int = 128,
        num_attention_heads: int = 48,
        joint_attention_dim: int = 15360,
        timestep_guidance_channels: int = 256,
        mlp_ratio: float = 3.0,
        axes_dims_rope: Tuple[int, ...] = (32, 32, 32, 32),
        rope_theta: int = 2000,
        eps: float = 1e-6,
        guidance_embeds: bool = True,
    ):
        super().__init__()
        self.out_channels = out_channels or in_channels
        self.inner_dim = num_attention_heads * attention_head_dim

        self.time_guidance_embed = _Flux2TimestepGuidanceEmbeddings(
            in_channels=timestep_guidance_channels, embedding_dim=self.inner_dim,
            bias=False, guidance_embeds=guidance_embeds,
        )
        self.double_stream_modulation_img = _Flux2Modulation(self.inner_dim, 2, bias=False)
        self.double_stream_modulation_txt = _Flux2Modulation(self.inner_dim, 2, bias=False)
        self.single_stream_modulation = _Flux2Modulation(self.inner_dim, 1, bias=False)
        self.x_embedder = Linear(in_channels, self.inner_dim, use_bias=False)
        self.context_embedder = Linear(joint_attention_dim, self.inner_dim, use_bias=False)
        self.transformer_blocks = ModuleList([
            Flux2TransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim,
                                  mlp_ratio=mlp_ratio, eps=eps, bias=False)
            for _ in range(num_layers)
        ])
        self.single_transformer_blocks = ModuleList([
            Flux2SingleTransformerBlock(self.inner_dim, num_attention_heads, attention_head_dim,
                                        mlp_ratio=mlp_ratio, eps=eps, bias=False)
            for _ in range(num_single_layers)
        ])
        self.norm_out = AdaLayerNormContinuous(self.inner_dim, self.inner_dim,
                                               elementwise_affine=False, eps=eps, bias=False)
        self.proj_out = Linear(self.inner_dim, patch_size * patch_size * self.out_channels, use_bias=False)

    def _rope(self, ids: jax.Array):
        coss, sins = [], []
        for i in range(len(self.config.axes_dims_rope)):
            cos, sin = get_1d_rotary_pos_embed(
                self.config.axes_dims_rope[i], ids[..., i], theta=float(self.config.rope_theta),
                repeat_interleave_real=True,
            )
            coss.append(cos)
            sins.append(sin)
        return jnp.concatenate(coss, axis=-1), jnp.concatenate(sins, axis=-1)

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
        num_txt = encoder_hidden_states.shape[1]
        timestep = jnp.asarray(timestep).astype(hidden_states.dtype) * 1000
        if guidance is not None:
            guidance = jnp.asarray(guidance).astype(hidden_states.dtype) * 1000
        temb = self.time_guidance_embed(params["time_guidance_embed"], timestep, guidance)

        mod_img = self.double_stream_modulation_img(params["double_stream_modulation_img"], temb)
        mod_txt = self.double_stream_modulation_txt(params["double_stream_modulation_txt"], temb)
        mod_single = self.single_stream_modulation(params["single_stream_modulation"], temb)

        x = self.x_embedder(params["x_embedder"], hidden_states)
        ehs = self.context_embedder(params["context_embedder"], encoder_hidden_states)

        if img_ids.ndim == 3:
            img_ids = img_ids[0]
        if txt_ids.ndim == 3:
            txt_ids = txt_ids[0]
        img_rope = self._rope(img_ids)
        txt_rope = self._rope(txt_ids)
        rope = (jnp.concatenate([txt_rope[0], img_rope[0]], axis=0),
                jnp.concatenate([txt_rope[1], img_rope[1]], axis=0))

        for i, block in enumerate(self.transformer_blocks):
            ehs, x = block(params["transformer_blocks"][i], x, ehs, mod_img, mod_txt, rope)

        x = jnp.concatenate([ehs, x], axis=1)
        for i, block in enumerate(self.single_transformer_blocks):
            x = block(params["single_transformer_blocks"][i], x, mod_single, rope)

        x = x[:, num_txt:]
        x = self.norm_out(params["norm_out"], x, temb)
        output = self.proj_out(params["proj_out"], x)
        if not return_dict:
            return (output,)
        return Flux2Transformer2DModelOutput(sample=output)
