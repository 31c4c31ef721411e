"""EasyAnimateTransformer3DModel (v5.1).

Behavioral mirror of the reference
`models/transformers/transformer_easyanimate.py`:
EasyAnimateLayerNormZero (one shared fp32 LN modulating both streams with
6 chunks, `:33`), MMDiT-style joint attention with separate context
qkv/out projections and per-head LayerNorm qk (`:112` — rotary applied
to the IMAGE segment only, interleaved convention), dual FFNs (img/txt),
CogVideoX-style 3D rotary over a resize-cropped 90x60 base grid (`:68`),
AdaLayerNorm(chunk_dim=1) out head.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import (
    TimestepEmbedding,
    Timesteps,
    apply_rotary_emb,
    get_3d_rotary_pos_embed_np,
)
from ..modeling_utils import ModelMixin
from ..normalization import AdaLayerNorm


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


def _resize_crop_region(src, tgt_width, tgt_height):
    h, w = src
    r = h / w
    if r > (tgt_height / tgt_width):
        resize_height = tgt_height
        resize_width = int(round(tgt_height / h * w))
    else:
        resize_width = tgt_width
        resize_height = int(round(tgt_width / w * h))
    crop_top = int(round((tgt_height - resize_height) / 2.0))
    crop_left = int(round((tgt_width - resize_width) / 2.0))
    return (crop_top, crop_left), (crop_top + resize_height, crop_left + resize_width)


def easyanimate_rope_np(attention_head_dim: int, patch_size: int, num_frames: int,
                        height: int, width: int):
    """(cos, sin) [F*h*w, head_dim] (reference EasyAnimateRotaryPosEmbed :68)."""
    gh, gw = height // patch_size, width // patch_size
    base_w, base_h = 90 // patch_size, 60 // patch_size
    crops = _resize_crop_region((gh, gw), base_w, base_h)
    return get_3d_rotary_pos_embed_np(attention_head_dim, crops, (gh, gw), num_frames)


class EasyAnimateLayerNormZero(Module):
    def __init__(self, conditioning_dim: int, embedding_dim: int, elementwise_affine=True,
                 eps: float = 1e-5):
        super().__init__()
        self.linear = Linear(conditioning_dim, 6 * embedding_dim, use_bias=True)
        self.norm = LayerNorm(embedding_dim, eps=eps, use_scale=elementwise_affine,
                              use_bias=elementwise_affine)

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb):
        mods = self.linear(params["linear"], jax.nn.silu(temb))
        shift, scale, gate, e_shift, e_scale, e_gate = jnp.split(mods, 6, axis=1)
        nparams = params.get("norm", {})
        hidden_states = self.norm(nparams, hidden_states) * (1 + scale[:, None]) + shift[:, None]
        encoder_hidden_states = (
            self.norm(nparams, encoder_hidden_states) * (1 + e_scale[:, None]) + e_shift[:, None]
        )
        return hidden_states, encoder_hidden_states, gate, e_gate


class _EasyAnimateAttention(Module):
    """Joint MMDiT attention (separate img/txt qkv, per-head LN qk, rotary on
    image tokens only)."""

    def __init__(self, dim: int, heads: int, dim_head: int, qk_norm: bool = True,
                 is_mmdit_block: bool = True):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.is_mmdit = is_mmdit_block
        inner = heads * dim_head
        self.to_q = Linear(dim, inner, use_bias=True)
        self.to_k = Linear(dim, inner, use_bias=True)
        self.to_v = Linear(dim, inner, use_bias=True)
        self.to_out = ModuleList([Linear(inner, dim, use_bias=True)])
        self.norm_q = LayerNorm(dim_head, eps=1e-6) if qk_norm else None
        self.norm_k = LayerNorm(dim_head, eps=1e-6) if qk_norm else None
        if is_mmdit_block:
            self.add_q_proj = Linear(dim, inner, use_bias=True)
            self.add_k_proj = Linear(dim, inner, use_bias=True)
            self.add_v_proj = Linear(dim, inner, use_bias=True)
            self.to_add_out = Linear(inner, dim, use_bias=True)
            self.norm_added_q = LayerNorm(dim_head, eps=1e-6) if qk_norm else None
            self.norm_added_k = LayerNorm(dim_head, eps=1e-6) if qk_norm else None

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, rope=None):
        B, S_img, _ = hidden_states.shape
        S_txt = encoder_hidden_states.shape[1]

        def heads_of(x):
            return jnp.transpose(x.reshape(B, -1, self.heads, self.dim_head), (0, 2, 1, 3))

        if self.is_mmdit:
            q = heads_of(self.to_q(params["to_q"], hidden_states))
            k = heads_of(self.to_k(params["to_k"], hidden_states))
            v = heads_of(self.to_v(params["to_v"], hidden_states))
            if self.norm_q is not None:
                q = self.norm_q(params["norm_q"], q)
                k = self.norm_k(params["norm_k"], k)
            eq = heads_of(self.add_q_proj(params["add_q_proj"], encoder_hidden_states))
            ek = heads_of(self.add_k_proj(params["add_k_proj"], encoder_hidden_states))
            ev = heads_of(self.add_v_proj(params["add_v_proj"], encoder_hidden_states))
            if self.norm_added_q is not None:
                eq = self.norm_added_q(params["norm_added_q"], eq)
                ek = self.norm_added_k(params["norm_added_k"], ek)
            q = jnp.concatenate([eq, q], axis=2)
            k = jnp.concatenate([ek, k], axis=2)
            v = jnp.concatenate([ev, v], axis=2)
        else:
            joint = jnp.concatenate([encoder_hidden_states, hidden_states], axis=1)
            q = heads_of(self.to_q(params["to_q"], joint))
            k = heads_of(self.to_k(params["to_k"], joint))
            v = heads_of(self.to_v(params["to_v"], joint))
            if self.norm_q is not None:
                q = self.norm_q(params["norm_q"], q)
                k = self.norm_k(params["norm_k"], k)

        if rope is not None:
            cos, sin = rope
            # rotary on the image segment only — [B, H, S, D] layout
            q_img = jnp.transpose(apply_rotary_emb(jnp.transpose(q[:, :, S_txt:], (0, 2, 1, 3)), cos, sin), (0, 2, 1, 3))
            k_img = jnp.transpose(apply_rotary_emb(jnp.transpose(k[:, :, S_txt:], (0, 2, 1, 3)), cos, sin), (0, 2, 1, 3))
            q = jnp.concatenate([q[:, :, :S_txt], q_img], axis=2)
            k = jnp.concatenate([k[:, :, :S_txt], k_img], axis=2)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(self.dim_head, q.dtype))
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, S_txt + S_img, -1)
        enc_out, img_out = out[:, :S_txt], out[:, S_txt:]
        img_out = self.to_out[0](params["to_out"][0], img_out)
        if self.is_mmdit:
            enc_out = self.to_add_out(params["to_add_out"], enc_out)
        return img_out, enc_out


class EasyAnimateTransformerBlock(Module):
    def __init__(self, dim, num_attention_heads, attention_head_dim, time_embed_dim,
                 activation_fn="gelu-approximate", norm_elementwise_affine=True,
                 norm_eps=1e-6, ff_inner_dim=None, ff_bias=True, qk_norm=True,
                 after_norm=False, is_mmdit_block=True):
        super().__init__()
        self.is_mmdit = is_mmdit_block
        self.norm1 = EasyAnimateLayerNormZero(time_embed_dim, dim, norm_elementwise_affine, norm_eps)
        self.attn1 = _EasyAnimateAttention(dim, num_attention_heads, attention_head_dim,
                                           qk_norm=qk_norm, is_mmdit_block=is_mmdit_block)
        self.norm2 = EasyAnimateLayerNormZero(time_embed_dim, dim, norm_elementwise_affine, norm_eps)
        self.ff = FeedForward(dim, activation_fn=activation_fn, inner_dim=ff_inner_dim, bias=ff_bias)
        self.txt_ff = (
            FeedForward(dim, activation_fn=activation_fn, inner_dim=ff_inner_dim, bias=ff_bias)
            if is_mmdit_block else None
        )
        self.norm3 = LayerNorm(dim, eps=norm_eps, use_scale=norm_elementwise_affine,
                               use_bias=norm_elementwise_affine) if after_norm else None

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb, rope=None):
        norm_hs, norm_ehs, gate, e_gate = self.norm1(
            params["norm1"], hidden_states, encoder_hidden_states, temb
        )
        attn_hs, attn_ehs = self.attn1(params["attn1"], norm_hs, norm_ehs, rope=rope)
        hidden_states = hidden_states + gate[:, None] * attn_hs
        encoder_hidden_states = encoder_hidden_states + e_gate[:, None] * attn_ehs

        norm_hs, norm_ehs, gate_ff, e_gate_ff = self.norm2(
            params["norm2"], hidden_states, encoder_hidden_states, temb
        )
        ff_hs = self.ff(params["ff"], norm_hs)
        ff_ehs = (self.txt_ff(params["txt_ff"], norm_ehs) if self.txt_ff is not None
                  else self.ff(params["ff"], norm_ehs))
        if self.norm3 is not None:
            ff_hs = self.norm3(params.get("norm3", {}), ff_hs)
            ff_ehs = self.norm3(params.get("norm3", {}), ff_ehs)
        hidden_states = hidden_states + gate_ff[:, None] * ff_hs
        encoder_hidden_states = encoder_hidden_states + e_gate_ff[:, None] * ff_ehs
        return hidden_states, encoder_hidden_states


class EasyAnimateTransformer3DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        num_attention_heads: int = 48,
        attention_head_dim: int = 64,
        in_channels: Optional[int] = None,
        out_channels: Optional[int] = None,
        patch_size: Optional[int] = None,
        sample_width: int = 90,
        sample_height: int = 60,
        activation_fn: str = "gelu-approximate",
        timestep_activation_fn: str = "silu",
        freq_shift: int = 0,
        num_layers: int = 48,
        mmdit_layers: int = 48,
        dropout: float = 0.0,
        time_embed_dim: int = 512,
        add_norm_text_encoder: bool = False,
        text_embed_dim: int = 3584,
        text_embed_dim_t5: Optional[int] = None,
        norm_eps: float = 1e-5,
        norm_elementwise_affine: bool = True,
        flip_sin_to_cos: bool = True,
        time_position_encoding_type: str = "3d_rope",
        after_norm: bool = False,
        resize_inpaint_mask_directly: bool = True,
        enable_text_attention_mask: bool = True,
        add_noise_in_inpaint_model: bool = True,
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.time_proj = Timesteps(inner_dim, flip_sin_to_cos, freq_shift)
        self.time_embedding = TimestepEmbedding(inner_dim, time_embed_dim, act_fn=timestep_activation_fn)
        self.proj = Conv2d(in_channels, inner_dim, kernel_size=patch_size, stride=patch_size, use_bias=True)
        # v5.1 uses plain linear text projections (add_norm_text_encoder=False)
        self.text_proj = Linear(text_embed_dim, inner_dim)
        self.text_proj_t5 = Linear(text_embed_dim_t5, inner_dim) if text_embed_dim_t5 else None
        self.transformer_blocks = ModuleList([
            EasyAnimateTransformerBlock(
                inner_dim, num_attention_heads, attention_head_dim, time_embed_dim,
                activation_fn=activation_fn, norm_elementwise_affine=norm_elementwise_affine,
                norm_eps=norm_eps, after_norm=after_norm, is_mmdit_block=(i < mmdit_layers),
            )
            for i in range(num_layers)
        ])
        self.norm_final = LayerNorm(inner_dim, eps=norm_eps, use_scale=norm_elementwise_affine,
                                    use_bias=norm_elementwise_affine)
        self.norm_out = AdaLayerNorm(time_embed_dim, output_dim=2 * inner_dim,
                                     norm_eps=norm_eps, chunk_dim=1,
                                     elementwise_affine=norm_elementwise_affine)
        self.proj_out = Linear(inner_dim, patch_size * patch_size * out_channels)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        timestep: jax.Array,
        timestep_cond: Optional[jax.Array] = None,
        encoder_hidden_states: Optional[jax.Array] = None,
        encoder_hidden_states_t5: Optional[jax.Array] = None,
        inpaint_latents: Optional[jax.Array] = None,
        control_latents: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        B, C, F, H, W = hidden_states.shape
        p = self.config.patch_size
        ph, pw = H // p, W // p

        timesteps = jnp.atleast_1d(jnp.asarray(timestep))
        timesteps = jnp.broadcast_to(timesteps, (B,))
        temb = self.time_proj({}, timesteps).astype(hidden_states.dtype)
        temb = self.time_embedding(params["time_embedding"], temb, timestep_cond)

        cos, sin = easyanimate_rope_np(self.config.attention_head_dim, p, F, H, W)
        rope = (jnp.asarray(cos), jnp.asarray(sin))

        if inpaint_latents is not None:
            hidden_states = jnp.concatenate([hidden_states, inpaint_latents], axis=1)
        if control_latents is not None:
            hidden_states = jnp.concatenate([hidden_states, control_latents], axis=1)

        x = jnp.transpose(hidden_states, (0, 2, 3, 4, 1)).reshape(B * F, H, W, -1)
        x = self.proj(params["proj"], x)
        x = x.reshape(B, F * ph * pw, self.inner_dim)

        ehs = self.text_proj(params["text_proj"], encoder_hidden_states)
        if encoder_hidden_states_t5 is not None and self.text_proj_t5 is not None:
            ehs_t5 = self.text_proj_t5(params["text_proj_t5"], encoder_hidden_states_t5)
            ehs = jnp.concatenate([ehs, ehs_t5], axis=1)

        for i, block in enumerate(self.transformer_blocks):
            x, ehs = block(params["transformer_blocks"][i], x, ehs, temb, rope=rope)

        x = self.norm_final(params["norm_final"], x)
        x = self.norm_out(params["norm_out"], x, temb)
        x = self.proj_out(params["proj_out"], x)

        x = x.reshape(B, F, ph, pw, -1, p, p)
        output = jnp.transpose(x, (0, 4, 1, 2, 5, 3, 6)).reshape(B, -1, F, H, W)
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)
