"""CogView4Transformer2DModel — ZhipuAI's GLM-conditioned image DiT.

Behavioral mirror of the reference
`/root/reference/src/diffusers/models/transformers/transformer_cogview4.py`
(CogView4PatchEmbed `:37`, CogView4AdaLayerNormZero `:66`,
CogView4AttnProcessor `:114`, block `:456`, rotary embed `:535`,
no-SiLU final AdaLN `:583`, model `:615`) and the combined
timestep/size embedding at `models/embeddings.py:1628`.

TPU design: joint text+image attention over one packed [B, S, D] stream with
the reference's float {0,1} pair "mask" reproduced as the additive bias torch
SDPA actually applies; half-split (rotate-half) RoPE on the image tokens.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import PixArtAlphaTextProjection, TimestepEmbedding, Timesteps
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class _LinearHolder(Module):
    """Places a modulation linear under the reference's `<name>.linear` path."""

    def __init__(self, in_dim: int, out_dim: int):
        super().__init__()
        self.linear = Linear(in_dim, out_dim, use_bias=True)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.linear(params["linear"], x)


def _ln(x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _rotate_half(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Half-split rotation (reference apply_rotary_emb use_real_unbind_dim=-2)."""
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos + rotated * sin).astype(x.dtype)


class CogView4PatchEmbed(Module):
    def __init__(self, in_channels: int, hidden_size: int, patch_size: int, text_hidden_size: int):
        super().__init__()
        self.patch_size = patch_size
        self.proj = Linear(in_channels * patch_size**2, hidden_size)
        self.text_proj = Linear(text_hidden_size, hidden_size)

    def __call__(self, params: Params, hidden_states: jax.Array, encoder_hidden_states: jax.Array):
        b, c, height, width = hidden_states.shape
        p = self.patch_size
        ph, pw = height // p, width // p
        h = hidden_states.reshape(b, c, ph, p, pw, p)
        h = jnp.transpose(h, (0, 2, 4, 1, 3, 5)).reshape(b, ph * pw, c * p * p)
        h = self.proj(params["proj"], h)
        ctx = self.text_proj(params["text_proj"], encoder_hidden_states)
        return h, ctx


class _CogView4Attention(Module):
    """Joint attention with param-free per-head layer-norm qk, half-split RoPE
    on the image tokens, and the reference's additive float pair mask."""

    def __init__(self, dim: int, heads: int, dim_head: int):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.to_q = Linear(dim, inner, use_bias=True)
        self.to_k = Linear(dim, inner, use_bias=True)
        self.to_v = Linear(dim, inner, use_bias=True)
        self.to_out = ModuleList([Linear(inner, dim, use_bias=True)])

    def __call__(self, params: Params, hidden_states, encoder_hidden_states,
                 attention_mask=None, image_rotary_emb=None):
        b, img_seq, _ = hidden_states.shape
        txt_seq = encoder_hidden_states.shape[1]
        joint = jnp.concatenate([encoder_hidden_states, hidden_states], axis=1)
        s = txt_seq + img_seq
        q = self.to_q(params["to_q"], joint).reshape(b, s, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], joint).reshape(b, s, self.heads, self.dim_head)
        v = self.to_v(params["to_v"], joint).reshape(b, s, self.heads, self.dim_head)
        q = _ln(q)
        k = _ln(k)
        if image_rotary_emb is not None:
            cos, sin = image_rotary_emb  # [img_seq, dim_head] fp32
            cos = cos[None, :, None, :]
            sin = sin[None, :, None, :]
            q = q.at[:, txt_seq:].set(_rotate_half(q[:, txt_seq:], cos, sin))
            k = k.at[:, txt_seq:].set(_rotate_half(k[:, txt_seq:], cos, sin))
        bias = None
        if attention_mask is not None:
            mix = jnp.concatenate(
                [attention_mask.astype(jnp.float32), jnp.ones((b, img_seq), jnp.float32)], axis=1
            )
            pair = mix[:, :, None] @ mix[:, None, :]
            bias = (pair > 0).astype(jnp.float32)[:, None, :, :]  # additive {0,1}
        out = dispatch_attention_fn(q, k, v, attn_mask=bias)
        out = out.reshape(b, s, self.heads * self.dim_head).astype(joint.dtype)
        out = self.to_out[0](params["to_out"][0], out)
        return out[:, txt_seq:], out[:, :txt_seq]


class CogView4TransformerBlock(Module):
    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int, time_embed_dim: int):
        super().__init__()
        self.norm1 = _LinearHolder(time_embed_dim, 12 * dim)
        self.attn1 = _CogView4Attention(dim, num_attention_heads, attention_head_dim)
        self.ff = FeedForward(dim=dim, dim_out=dim, activation_fn="gelu-approximate")

    def __call__(self, params: Params, hidden_states, encoder_hidden_states, temb,
                 image_rotary_emb=None, attention_mask=None):
        mods = self.norm1(params["norm1"], temb)
        (shift_msa, c_shift_msa, scale_msa, c_scale_msa, gate_msa, c_gate_msa,
         shift_mlp, c_shift_mlp, scale_mlp, c_scale_mlp, gate_mlp, c_gate_mlp) = jnp.split(mods, 12, axis=1)

        norm_h = _ln(hidden_states) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        norm_c = _ln(encoder_hidden_states) * (1 + c_scale_msa[:, None]) + c_shift_msa[:, None]

        attn_h, attn_c = self.attn1(params["attn1"], norm_h, norm_c,
                                    attention_mask=attention_mask, image_rotary_emb=image_rotary_emb)
        hidden_states = hidden_states + attn_h * gate_msa[:, None]
        encoder_hidden_states = encoder_hidden_states + attn_c * c_gate_msa[:, None]

        norm_h = _ln(hidden_states) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        norm_c = _ln(encoder_hidden_states) * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]
        hidden_states = hidden_states + self.ff(params["ff"], norm_h) * gate_mlp[:, None]
        encoder_hidden_states = encoder_hidden_states + self.ff(params["ff"], norm_c) * c_gate_mlp[:, None]
        return hidden_states, encoder_hidden_states


class CogView3CombinedTimestepSizeEmbeddings(Module):
    def __init__(self, embedding_dim: int, condition_dim: int, pooled_projection_dim: int, timesteps_dim: int = 256):
        super().__init__()
        self.time_proj = Timesteps(timesteps_dim, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.condition_proj = Timesteps(condition_dim, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(timesteps_dim, embedding_dim)
        self.condition_embedder = PixArtAlphaTextProjection(pooled_projection_dim, embedding_dim, act_fn="silu")

    def __call__(self, params: Params, timestep, original_size, target_size, crop_coords, dtype):
        t_proj = self.time_proj({}, timestep).astype(dtype)
        b = original_size.shape[0]
        os_proj = self.condition_proj({}, original_size.reshape(-1)).reshape(b, -1)
        cc_proj = self.condition_proj({}, crop_coords.reshape(-1)).reshape(b, -1)
        ts_proj = self.condition_proj({}, target_size.reshape(-1)).reshape(b, -1)
        cond = jnp.concatenate([os_proj, cc_proj, ts_proj], axis=1).astype(dtype)
        return (
            self.timestep_embedder(params["timestep_embedder"], t_proj)
            + self.condition_embedder(params["condition_embedder"], cond)
        )


class CogView4Transformer2DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        patch_size: int = 2,
        in_channels: int = 16,
        out_channels: int = 16,
        num_layers: int = 30,
        attention_head_dim: int = 40,
        num_attention_heads: int = 64,
        text_embed_dim: int = 4096,
        time_embed_dim: int = 512,
        condition_dim: int = 256,
        pos_embed_max_size: int = 128,
        sample_size: int = 128,
        rope_axes_dim: Tuple[int, int] = (256, 256),
    ):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.patch_embed = CogView4PatchEmbed(in_channels, inner_dim, patch_size, text_embed_dim)
        self.time_condition_embed = CogView3CombinedTimestepSizeEmbeddings(
            embedding_dim=time_embed_dim,
            condition_dim=condition_dim,
            pooled_projection_dim=3 * 2 * condition_dim,
            timesteps_dim=inner_dim,
        )
        self.transformer_blocks = ModuleList(
            [
                CogView4TransformerBlock(inner_dim, num_attention_heads, attention_head_dim, time_embed_dim)
                for _ in range(num_layers)
            ]
        )
        # CogView4 final AdaLN: NO activation on the conditioning
        self.norm_out = _LinearHolder(time_embed_dim, inner_dim * 2)
        self.proj_out = Linear(inner_dim, patch_size * patch_size * out_channels, use_bias=True)

    def rope(self, height: int, width: int):
        """Half-split 2D RoPE tables (reference CogView4RotaryPosEmbed:535)."""
        p = self.config.patch_size
        ph, pw = height // p, width // p
        dim = self.config.attention_head_dim
        dim_h = dim_w = dim // 2
        theta = 10000.0
        h_inv = 1.0 / (theta ** (np.arange(0, dim_h, 2, dtype=np.float32)[: dim_h // 2] / dim_h))
        w_inv = 1.0 / (theta ** (np.arange(0, dim_w, 2, dtype=np.float32)[: dim_w // 2] / dim_w))
        h_seq = np.arange(self.config.rope_axes_dim[0])
        w_seq = np.arange(self.config.rope_axes_dim[1])
        freqs_h = np.outer(h_seq, h_inv)[np.arange(ph) * self.config.rope_axes_dim[0] // ph]
        freqs_w = np.outer(w_seq, w_inv)[np.arange(pw) * self.config.rope_axes_dim[1] // pw]
        fh = np.broadcast_to(freqs_h[:, None, :], (ph, pw, freqs_h.shape[-1]))
        fw = np.broadcast_to(freqs_w[None, :, :], (ph, pw, freqs_w.shape[-1]))
        freqs = np.concatenate([fh, fw], axis=-1)
        freqs = np.concatenate([freqs, freqs], axis=-1).reshape(ph * pw, -1)
        return np.cos(freqs).astype(np.float32), np.sin(freqs).astype(np.float32)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,  # [B, C, H, W]
        encoder_hidden_states: jax.Array,
        timestep: jax.Array,
        original_size: jax.Array,
        target_size: jax.Array,
        crop_coords: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        image_rotary_emb=None,
        return_dict: bool = True,
    ):
        b, c, height, width = hidden_states.shape
        p = self.config.patch_size
        ph, pw = height // p, width // p

        if image_rotary_emb is None:
            cos, sin = self.rope(height, width)
            image_rotary_emb = (jnp.asarray(cos), jnp.asarray(sin))

        h, ctx = self.patch_embed(params["patch_embed"], hidden_states, encoder_hidden_states)
        temb = self.time_condition_embed(
            params["time_condition_embed"], timestep, original_size, target_size, crop_coords, h.dtype
        )
        temb = jax.nn.silu(temb)

        for i, block in enumerate(self.transformer_blocks):
            h, ctx = block(params["transformer_blocks"][i], h, ctx, temb,
                           image_rotary_emb=image_rotary_emb, attention_mask=attention_mask)

        mods = self.norm_out(params["norm_out"], temb.astype(h.dtype))
        scale, shift = jnp.split(mods, 2, axis=1)
        h = _ln(h) * (1 + scale[:, None]) + shift[:, None]
        h = self.proj_out(params["proj_out"], h)

        # proj_out features are (C, p, q) channel-major (reference `:791`)
        h = h.reshape(b, ph, pw, self.config.out_channels, p, p)
        h = jnp.transpose(h, (0, 3, 1, 4, 2, 5))
        output = h.reshape(b, self.config.out_channels, ph * p, pw * p)

        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)
