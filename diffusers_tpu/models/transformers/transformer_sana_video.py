"""SanaVideoTransformer3DModel — Sana-Video linear-attention video DiT.

Behavioral mirror of the reference
`models/transformers/transformer_sana_video.py`: ReLU linear
self-attention with RMS qk over the inner dim and interleaved rotary
applied AFTER the ReLU — the normalizer `z` uses the UN-rotated q/k while
the numerator uses the rotated pair (`SanaLinearAttnProcessor3_0` `:97`);
Wan-style 3-axis rotary with repeat-interleaved tables (`:175`); softmax
cross-attention on the un-normed stream; GLUMB temporal-conv FFN over the
(F, H, W) grid with a (3,1) temporal mixer (`:37`); AdaLN-single
timestep; modulated out norm.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv2d, Conv3d, LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..embeddings import PixArtAlphaTextProjection, get_1d_rotary_pos_embed_np
from ..modeling_utils import ModelMixin
from .pixart_transformer_2d import AdaLayerNormSingle


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


def sana_video_rope_np(attention_head_dim: int, patch_size, num_frames: int, height: int, width: int,
                       max_seq_len: int = 1024, theta: float = 10000.0):
    """(cos, sin) [N, head_dim] with t/h/w axis tables repeat-interleaved
    (reference WanRotaryPosEmbed in transformer_sana_video :175)."""
    p_t, p_h, p_w = patch_size
    ppf, pph, ppw = num_frames // p_t, height // p_h, width // p_w
    h_dim = w_dim = 2 * (attention_head_dim // 6)
    t_dim = attention_head_dim - h_dim - w_dim

    tabs = []
    for dim in (t_dim, h_dim, w_dim):
        cos, sin = get_1d_rotary_pos_embed_np(dim, np.arange(max_seq_len), theta=theta,
                                              repeat_interleave_real=True)
        tabs.append((cos, sin))

    def grid(axis_tab, n, axis):
        cos, sin = axis_tab
        cos, sin = cos[:n], sin[:n]
        shape = [1, 1, 1, cos.shape[-1]]
        shape[axis] = n
        reps = [ppf, pph, ppw, 1]
        reps[axis] = 1
        return (np.tile(cos.reshape(shape), reps), np.tile(sin.reshape(shape), reps))

    ct, st = grid(tabs[0], ppf, 0)
    ch, sh = grid(tabs[1], pph, 1)
    cw, sw = grid(tabs[2], ppw, 2)
    cos = np.concatenate([ct, ch, cw], axis=-1).reshape(ppf * pph * ppw, -1)
    sin = np.concatenate([st, sh, sw], axis=-1).reshape(ppf * pph * ppw, -1)
    return cos.astype(np.float32), sin.astype(np.float32)


def _apply_sana_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Interleaved rotary on [B, N, H, D]; cos/sin [N, D] repeat-interleaved
    (reference processor's inner apply_rotary_emb: cos[0::2], sin[1::2])."""
    c = cos[None, :, None, 0::2]
    s = sin[None, :, None, 1::2]
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


class GLUMBTempConv(Module):
    def __init__(self, in_channels: int, out_channels: int, expand_ratio: float = 4,
                 norm_type: Optional[str] = None, residual_connection: bool = True):
        super().__init__()
        hidden = int(expand_ratio * in_channels)
        self.residual_connection = residual_connection
        self.norm_type = norm_type
        self.conv_inverted = Conv2d(in_channels, hidden * 2, kernel_size=1)
        self.conv_depth = Conv2d(hidden * 2, hidden * 2, kernel_size=3, padding=1, groups=hidden * 2)
        self.conv_point = Conv2d(hidden, out_channels, kernel_size=1, use_bias=False)
        if norm_type == "rms_norm":
            self.norm = RMSNorm(out_channels, eps=1e-5, use_bias=True)
        self.conv_temp = Conv2d(out_channels, out_channels, kernel_size=(3, 1),
                                padding=(1, 0), use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        """x: [B, F, H, W, C]."""
        if self.residual_connection:
            residual = x
        B, F, H, W, C = x.shape
        h = x.reshape(B * F, H, W, C)
        h = self.conv_inverted(params["conv_inverted"], h)
        h = jax.nn.silu(h)
        h = self.conv_depth(params["conv_depth"], h)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.silu(gate)
        h = self.conv_point(params["conv_point"], h)
        # temporal aggregation over a [B, F, H*W, C] grid with a (3,1) conv
        ht = h.reshape(B, F, H * W, C)
        h = ht + self.conv_temp(params["conv_temp"], ht)
        h = h.reshape(B, F, H, W, C)
        if self.norm_type == "rms_norm":
            h = self.norm(params["norm"], h)
        if self.residual_connection:
            h = h + residual
        return h


class _SanaVideoLinearAttention(Module):
    def __init__(self, dim, heads, dim_head, qk_norm=True, bias=True):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.to_q = Linear(dim, inner, use_bias=bias)
        self.to_k = Linear(dim, inner, use_bias=bias)
        self.to_v = Linear(dim, inner, use_bias=bias)
        self.to_out = ModuleList([Linear(inner, dim, use_bias=True)])
        self.norm_q = RMSNorm(inner, eps=1e-5) if qk_norm else None
        self.norm_k = RMSNorm(inner, eps=1e-5) if qk_norm else None

    def __call__(self, params: Params, x: jax.Array, rotary_emb) -> jax.Array:
        B, N, _ = x.shape
        q = self.to_q(params["to_q"], x)
        k = self.to_k(params["to_k"], x)
        v = self.to_v(params["to_v"], x)
        if self.norm_q is not None:
            q = self.norm_q(params["norm_q"], q)
            k = self.norm_k(params["norm_k"], k)
        q = q.reshape(B, N, self.heads, self.dim_head)
        k = k.reshape(B, N, self.heads, self.dim_head)
        v = v.reshape(B, N, self.heads, self.dim_head)
        q = jax.nn.relu(q)
        k = jax.nn.relu(k)
        cos, sin = rotary_emb
        q_rot = _apply_sana_rotary(q, cos, sin)
        k_rot = _apply_sana_rotary(k, cos, sin)

        # [B, H, D, N]
        to_hd_n = lambda t: jnp.transpose(t, (0, 2, 3, 1))
        q, k = to_hd_n(q), to_hd_n(k)
        q_rot = to_hd_n(q_rot).astype(jnp.float32)
        k_rot = to_hd_n(k_rot).astype(jnp.float32)
        v32 = to_hd_n(v).astype(jnp.float32)

        # z from the UN-rotated pair (reference :159)
        z = 1.0 / (jnp.einsum("bhdn,bhdm->bhnm", k.sum(axis=-1, keepdims=True), q) + 1e-15)
        scores = jnp.einsum("bhdn,bhen->bhde", v32, k_rot)
        out = jnp.einsum("bhde,bhen->bhdn", scores, q_rot)
        out = out * z  # z: [B, H, 1, N] broadcast over D
        out = jnp.transpose(out.reshape(B, self.heads * self.dim_head, N), (0, 2, 1)).astype(x.dtype)
        return self.to_out[0](params["to_out"][0], out)


class _SanaVideoCrossAttention(Module):
    def __init__(self, dim, heads, dim_head, cross_attention_dim, qk_norm=True):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.to_q = Linear(dim, inner, use_bias=True)
        self.to_k = Linear(cross_attention_dim, inner, use_bias=True)
        self.to_v = Linear(cross_attention_dim, inner, use_bias=True)
        self.to_out = ModuleList([Linear(inner, dim, use_bias=True)])
        self.norm_q = RMSNorm(inner, eps=1e-5) if qk_norm else None
        self.norm_k = RMSNorm(inner, eps=1e-5) if qk_norm else None

    def __call__(self, params: Params, x, context, additive_mask=None):
        B, N, _ = x.shape
        q = self.to_q(params["to_q"], x)
        k = self.to_k(params["to_k"], context)
        v = self.to_v(params["to_v"], context)
        if self.norm_q is not None:
            q = self.norm_q(params["norm_q"], q)
            k = self.norm_k(params["norm_k"], k)
        q = jnp.transpose(q.reshape(B, N, self.heads, self.dim_head), (0, 2, 1, 3))
        k = jnp.transpose(k.reshape(B, -1, self.heads, self.dim_head), (0, 2, 1, 3))
        v = jnp.transpose(v.reshape(B, -1, self.heads, self.dim_head), (0, 2, 1, 3))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(self.dim_head)
        if additive_mask is not None:
            scores = scores + additive_mask[:, None].astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, -1)
        return self.to_out[0](params["to_out"][0], out)


class SanaVideoTransformerBlock(Module):
    def __init__(self, dim, num_attention_heads, attention_head_dim,
                 num_cross_attention_heads, cross_attention_head_dim, cross_attention_dim,
                 attention_bias=True, norm_eps=1e-6, mlp_ratio=3.0, qk_norm=True):
        super().__init__()
        self.dim = dim
        self.norm1 = LayerNorm(dim, eps=norm_eps, use_scale=False, use_bias=False)
        self.attn1 = _SanaVideoLinearAttention(dim, num_attention_heads, attention_head_dim,
                                               qk_norm=qk_norm, bias=attention_bias)
        self.has_cross = cross_attention_dim is not None
        if self.has_cross:
            self.norm2 = LayerNorm(dim, eps=norm_eps, use_scale=False, use_bias=False)
            self.attn2 = _SanaVideoCrossAttention(dim, num_cross_attention_heads,
                                                 cross_attention_head_dim, cross_attention_dim,
                                                 qk_norm=qk_norm)
        self.ff = GLUMBTempConv(dim, dim, mlp_ratio, norm_type=None, residual_connection=False)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype)
        params["scale_shift_table"] = jax.random.normal(key, (6, self.dim), dtype) / self.dim**0.5
        return params

    def __call__(self, params: Params, hidden_states, encoder_hidden_states,
                 encoder_additive_mask, timestep, frames, height, width, rotary_emb):
        B = hidden_states.shape[0]
        mods = params["scale_shift_table"][None, None] + timestep.reshape(B, timestep.shape[1], 6, -1)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = [
            m[:, :, 0] for m in jnp.split(mods, 6, axis=2)
        ]
        norm_hs = self.norm1({}, hidden_states)
        norm_hs = (norm_hs * (1 + scale_msa) + shift_msa).astype(hidden_states.dtype)
        attn_out = self.attn1(params["attn1"], norm_hs, rotary_emb)
        hidden_states = hidden_states + gate_msa * attn_out

        if self.has_cross:
            attn_out = self.attn2(params["attn2"], hidden_states, encoder_hidden_states,
                                  encoder_additive_mask)
            hidden_states = hidden_states + attn_out

        norm_hs = self.norm2({}, hidden_states)
        norm_hs = norm_hs * (1 + scale_mlp) + shift_mlp
        norm_hs = norm_hs.reshape(B, frames, height, width, -1)
        ff_out = self.ff(params["ff"], norm_hs).reshape(B, frames * height * width, -1)
        hidden_states = hidden_states + gate_mlp * ff_out
        return hidden_states


class SanaVideoTransformer3DModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        in_channels: int = 16,
        out_channels: Optional[int] = 16,
        num_attention_heads: int = 20,
        attention_head_dim: int = 112,
        num_layers: int = 20,
        num_cross_attention_heads: Optional[int] = 20,
        cross_attention_head_dim: Optional[int] = 112,
        cross_attention_dim: Optional[int] = 2240,
        caption_channels: int = 2304,
        mlp_ratio: float = 2.5,
        dropout: float = 0.0,
        attention_bias: bool = False,
        sample_size: int = 30,
        patch_size: Tuple[int, ...] = (1, 2, 2),
        norm_elementwise_affine: bool = False,
        norm_eps: float = 1e-6,
        interpolation_scale: Optional[int] = None,
        guidance_embeds: bool = False,
        guidance_embeds_scale: float = 0.1,
        qk_norm: Optional[str] = "rms_norm_across_heads",
        rope_max_seq_len: int = 1024,
    ):
        super().__init__()
        out_channels = out_channels or in_channels
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.out_channels = out_channels

        self.patch_embedding = Conv3d(in_channels, inner_dim, kernel_size=tuple(patch_size),
                                      stride=tuple(patch_size), padding=0)
        if guidance_embeds:
            raise NotImplementedError("guidance-distilled Sana-Video variant not yet supported")
        self.time_embed = AdaLayerNormSingle(inner_dim)
        self.caption_projection = PixArtAlphaTextProjection(in_features=caption_channels,
                                                            hidden_size=inner_dim)
        self.caption_norm = RMSNorm(inner_dim, eps=1e-5)
        self.transformer_blocks = ModuleList([
            SanaVideoTransformerBlock(
                inner_dim, num_attention_heads, attention_head_dim,
                num_cross_attention_heads, cross_attention_head_dim, cross_attention_dim,
                attention_bias=attention_bias, norm_eps=norm_eps, mlp_ratio=mlp_ratio,
                qk_norm=qk_norm is not None,
            )
            for _ in range(num_layers)
        ])
        self.norm_out = LayerNorm(inner_dim, eps=1e-6, use_scale=False, use_bias=False)
        self.proj_out = Linear(inner_dim, math.prod(patch_size) * out_channels)

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
        guidance: Optional[jax.Array] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        B, C, F, H, W = hidden_states.shape
        p_t, p_h, p_w = self.config.patch_size
        ppf, pph, ppw = F // p_t, H // p_h, W // p_w

        enc_mask = None
        if encoder_attention_mask is not None and encoder_attention_mask.ndim == 2:
            enc_mask = ((1 - encoder_attention_mask.astype(jnp.float32)) * -10000.0)[:, None, :]

        cos, sin = sana_video_rope_np(self.config.attention_head_dim, self.config.patch_size,
                                      F, H, W, self.config.rope_max_seq_len)
        rope = (jnp.asarray(cos), jnp.asarray(sin))

        x = jnp.transpose(hidden_states, (0, 2, 3, 4, 1))
        x = self.patch_embedding(params["patch_embedding"], x)
        x = x.reshape(B, ppf * pph * ppw, -1)

        timestep_mod, embedded_timestep = self.time_embed(
            params["time_embed"], jnp.atleast_1d(jnp.asarray(timestep)).reshape(-1),
            batch_size=B, dtype=x.dtype,
        )
        timestep_mod = timestep_mod.reshape(B, -1, timestep_mod.shape[-1])
        embedded_timestep = embedded_timestep.reshape(B, -1, embedded_timestep.shape[-1])

        ehs = self.caption_projection(params["caption_projection"], encoder_hidden_states)
        ehs = ehs.reshape(B, -1, x.shape[-1])
        ehs = self.caption_norm(params["caption_norm"], ehs)

        for i, block in enumerate(self.transformer_blocks):
            x = block(params["transformer_blocks"][i], x, ehs, enc_mask, timestep_mod,
                      ppf, pph, ppw, rope)

        # modulated out norm (reference SanaModulatedNorm :240)
        x = self.norm_out({}, x)
        mods = params["scale_shift_table"][None, None] + embedded_timestep[:, :, None]
        shift, scale = mods[:, :, 0], mods[:, :, 1]
        x = x * (1 + scale) + shift
        x = self.proj_out(params["proj_out"], x)

        x = x.reshape(B, ppf, pph, ppw, p_t, p_h, p_w, -1)
        x = jnp.transpose(x, (0, 7, 1, 4, 2, 5, 3, 6))
        output = x.reshape(B, -1, F, H, W)
        if not return_dict:
            return (output,)
        return Transformer2DModelOutput(sample=output)
