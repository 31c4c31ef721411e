"""LTX2 text connectors — per-modality 1D transformers over packed per-layer
Gemma3 hidden states.

Behavioral mirror of the reference (`/root/reference/src/diffusers/pipelines/
ltx2/connectors.py`: per_layer_masked_mean_norm `:13`, LTX2RotaryPosEmbed1d
`:86`, LTX2TransformerBlock1d `:174`, LTX2ConnectorTransformer1d `:218`,
LTX2TextConnectors `:335`).

TPU-native notes: the 1D rope tables are static in (batch, seq) so they are
precomputed host-side with numpy in float64 (the reference's
double_precision) — no f64 requirement on device; the register-replacement
scatter is expressed as a stable argsort + where, which XLA lowers to a
single sort + select (no dynamic shapes)."""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...models.attention_blocks import FeedForward
from ...models.modeling_utils import ModelMixin
from ...models.transformers.transformer_ltx2 import LTX2Attention
from ...ops.module import Module, ModuleList, Params, RMSNorm


def per_layer_masked_mean_norm(
    text_hidden_states: jax.Array,
    sequence_lengths: jax.Array,
    padding_side: str = "left",
    scale_factor: int = 8,
    eps: float = 1e-6,
) -> jax.Array:
    """Masked per-layer mean/range normalization (`connectors.py:13`).
    text_hidden_states: [B, S, D, L] → returns [B, S, D*L]."""
    b, s, d, n_layers = text_hidden_states.shape
    dtype = text_hidden_states.dtype
    x = text_hidden_states.astype(jnp.float32)

    idx = jnp.arange(s)[None, :]
    if padding_side == "right":
        mask = idx < sequence_lengths[:, None]
    elif padding_side == "left":
        mask = idx >= (s - sequence_lengths[:, None])
    else:
        raise ValueError(f"padding_side must be 'left' or 'right', got {padding_side}")
    m = mask[:, :, None, None]

    num_valid = (sequence_lengths * d).reshape(b, 1, 1, 1).astype(jnp.float32)
    masked_mean = jnp.where(m, x, 0.0).sum(axis=(1, 2), keepdims=True) / (num_valid + eps)
    x_min = jnp.where(m, x, jnp.inf).min(axis=(1, 2), keepdims=True)
    x_max = jnp.where(m, x, -jnp.inf).max(axis=(1, 2), keepdims=True)
    normed = (x - masked_mean) / (x_max - x_min + eps) * scale_factor
    normed = jnp.where(m, normed, 0.0)
    return normed.reshape(b, s, d * n_layers).astype(dtype)


def per_token_rms_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMS over the hidden dim of [B, S, D, L] (`connectors.py:80`)."""
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=2, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class LTX2RotaryPosEmbed1d:
    """1D rope for the connectors (`connectors.py:86`); host-precomputed."""

    def __init__(self, dim: int, base_seq_len: int = 4096, theta: float = 10000.0,
                 double_precision: bool = True, rope_type: str = "interleaved",
                 num_attention_heads: int = 32):
        if rope_type not in ("interleaved", "split"):
            raise ValueError(f"{rope_type=} not supported.")
        self.dim = dim
        self.base_seq_len = base_seq_len
        self.theta = theta
        self.double_precision = double_precision
        self.rope_type = rope_type
        self.num_attention_heads = num_attention_heads

    def __call__(self, batch_size: int, pos: int) -> Tuple[jax.Array, jax.Array]:
        grid = (np.arange(pos, dtype=np.float32) / self.base_seq_len)[None, :].repeat(batch_size, 0)
        f_dtype = np.float64 if self.double_precision else np.float32
        pow_idx = self.theta ** np.linspace(0.0, 1.0, self.dim // 2, dtype=f_dtype)
        freqs = (pow_idx * math.pi / 2.0).astype(np.float32)
        freqs = (grid[..., None] * 2 - 1) * freqs  # [B, S, dim//2]

        if self.rope_type == "interleaved":
            cos = np.repeat(np.cos(freqs), 2, axis=-1)
            sin = np.repeat(np.sin(freqs), 2, axis=-1)
            if self.dim % 2 != 0:
                cos = np.concatenate([np.ones_like(cos[:, :, : self.dim % 2]), cos], axis=-1)
                sin = np.concatenate([np.zeros_like(sin[:, :, : self.dim % 2]), sin], axis=-1)
        else:
            cos, sin = np.cos(freqs), np.sin(freqs)
            pad = self.dim // 2 - cos.shape[-1]
            if pad:
                cos = np.concatenate([np.ones_like(cos[:, :, :pad]), cos], axis=-1)
                sin = np.concatenate([np.zeros_like(sin[:, :, :pad]), sin], axis=-1)
            b, t = cos.shape[:2]
            cos = np.swapaxes(cos.reshape(b, t, self.num_attention_heads, -1), 1, 2)
            sin = np.swapaxes(sin.reshape(b, t, self.num_attention_heads, -1), 1, 2)
        return jnp.asarray(cos), jnp.asarray(sin)


class LTX2TransformerBlock1d(Module):
    """RMS-pre-norm self-attention + gelu FF block (`connectors.py:174`)."""

    def __init__(self, dim: int, num_attention_heads: int, attention_head_dim: int,
                 activation_fn: str = "gelu-approximate", eps: float = 1e-6,
                 rope_type: str = "interleaved", apply_gated_attention: bool = False):
        super().__init__()
        self.norm1 = RMSNorm(dim, eps=eps, use_scale=False)
        self.attn1 = LTX2Attention(
            query_dim=dim, heads=num_attention_heads, kv_heads=num_attention_heads,
            dim_head=attention_head_dim, rope_type=rope_type,
            apply_gated_attention=apply_gated_attention,
        )
        self.norm2 = RMSNorm(dim, eps=eps, use_scale=False)
        self.ff = FeedForward(dim, activation_fn=activation_fn)

    def __call__(self, params: Params, x: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None) -> jax.Array:
        h = self.norm1({}, x)
        x = x + self.attn1(params["attn1"], h, attention_mask=attention_mask,
                           query_rotary_emb=rotary_emb)
        h = self.norm2({}, x)
        return x + self.ff(params["ff"], h)


class LTX2ConnectorTransformer1d(Module):
    """Per-modality 1D connector transformer (`connectors.py:218`)."""

    def __init__(self, num_attention_heads: int = 30, attention_head_dim: int = 128,
                 num_layers: int = 2, num_learnable_registers: Optional[int] = 128,
                 rope_base_seq_len: int = 4096, rope_theta: float = 10000.0,
                 rope_double_precision: bool = True, eps: float = 1e-6,
                 causal_temporal_positioning: bool = False, rope_type: str = "interleaved",
                 gated_attention: bool = False):
        super().__init__()
        self.inner_dim = num_attention_heads * attention_head_dim
        self.num_learnable_registers = num_learnable_registers
        self.rope = LTX2RotaryPosEmbed1d(
            self.inner_dim, base_seq_len=rope_base_seq_len, theta=rope_theta,
            double_precision=rope_double_precision, rope_type=rope_type,
            num_attention_heads=num_attention_heads,
        )
        self.transformer_blocks = ModuleList([
            LTX2TransformerBlock1d(
                dim=self.inner_dim, num_attention_heads=num_attention_heads,
                attention_head_dim=attention_head_dim, rope_type=rope_type,
                apply_gated_attention=gated_attention,
            )
            for _ in range(num_layers)
        ])
        self.norm_out = RMSNorm(self.inner_dim, eps=eps, use_scale=False)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        if self.num_learnable_registers is not None:
            params["learnable_registers"] = (
                jax.random.uniform(key, (self.num_learnable_registers, self.inner_dim), dtype) * 2.0 - 1.0
            )
        return params

    def __call__(self, params: Params, hidden_states: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 attn_mask_binarize_threshold: float = -9000.0):
        b, s, _ = hidden_states.shape
        if self.num_learnable_registers is not None:
            if s % self.num_learnable_registers != 0:
                raise ValueError(
                    f"sequence length {s} must be divisible by num_learnable_registers"
                    f" {self.num_learnable_registers}"
                )
            reps = s // self.num_learnable_registers
            registers = jnp.tile(params["learnable_registers"], (reps, 1))  # [S, D]

            binary = (attention_mask >= attn_mask_binarize_threshold).astype(jnp.int32)
            if binary.ndim == 4:
                binary = binary[:, 0, 0, :]
            # stable argsort moves valid tokens to the front in original order
            # (reference `_replace_padded_with_learnable_registers` parity, `:309`)
            order = jnp.argsort(1 - binary, axis=1, stable=True)
            front = jnp.take_along_axis(hidden_states, order[..., None], axis=1)
            num_valid = binary.sum(axis=1, keepdims=True)
            front_mask = (jnp.arange(s)[None, :] < num_valid)[..., None]
            hidden_states = jnp.where(front_mask, front, registers[None].astype(hidden_states.dtype))
            attention_mask = jnp.zeros_like(attention_mask)

        rotary_emb = self.rope(b, s)
        for i, block in enumerate(self.transformer_blocks):
            hidden_states = block(params["transformer_blocks"][i], hidden_states,
                                  attention_mask=attention_mask, rotary_emb=rotary_emb)
        return self.norm_out({}, hidden_states), attention_mask


class LTX2TextConnectors(Module, ModelMixin, ConfigMixin):
    """Video + audio text connector stack (`connectors.py:335`)."""

    @register_to_config
    def __init__(
        self,
        caption_channels: int = 3840,
        text_proj_in_factor: int = 49,
        video_connector_num_attention_heads: int = 30,
        video_connector_attention_head_dim: int = 128,
        video_connector_num_layers: int = 2,
        video_connector_num_learnable_registers: Optional[int] = 128,
        video_gated_attn: bool = False,
        audio_connector_num_attention_heads: int = 30,
        audio_connector_attention_head_dim: int = 128,
        audio_connector_num_layers: int = 2,
        audio_connector_num_learnable_registers: Optional[int] = 128,
        audio_gated_attn: bool = False,
        connector_rope_base_seq_len: int = 4096,
        rope_theta: float = 10000.0,
        rope_double_precision: bool = True,
        causal_temporal_positioning: bool = False,
        rope_type: str = "interleaved",
        per_modality_projections: bool = False,
        video_hidden_dim: int = 4096,
        audio_hidden_dim: int = 2048,
        proj_bias: bool = False,
    ):
        super().__init__()
        from ...ops.module import Linear

        text_encoder_dim = caption_channels * text_proj_in_factor
        if per_modality_projections:
            self.video_text_proj_in = Linear(text_encoder_dim, video_hidden_dim, use_bias=proj_bias)
            self.audio_text_proj_in = Linear(text_encoder_dim, audio_hidden_dim, use_bias=proj_bias)
        else:
            self.text_proj_in = Linear(text_encoder_dim, caption_channels, use_bias=proj_bias)

        self.video_connector = LTX2ConnectorTransformer1d(
            num_attention_heads=video_connector_num_attention_heads,
            attention_head_dim=video_connector_attention_head_dim,
            num_layers=video_connector_num_layers,
            num_learnable_registers=video_connector_num_learnable_registers,
            rope_base_seq_len=connector_rope_base_seq_len, rope_theta=rope_theta,
            rope_double_precision=rope_double_precision,
            causal_temporal_positioning=causal_temporal_positioning,
            rope_type=rope_type, gated_attention=video_gated_attn,
        )
        self.audio_connector = LTX2ConnectorTransformer1d(
            num_attention_heads=audio_connector_num_attention_heads,
            attention_head_dim=audio_connector_attention_head_dim,
            num_layers=audio_connector_num_layers,
            num_learnable_registers=audio_connector_num_learnable_registers,
            rope_base_seq_len=connector_rope_base_seq_len, rope_theta=rope_theta,
            rope_double_precision=rope_double_precision,
            causal_temporal_positioning=causal_temporal_positioning,
            rope_type=rope_type, gated_attention=audio_gated_attn,
        )

    def __call__(self, params: Params, text_encoder_hidden_states: jax.Array,
                 attention_mask: jax.Array, padding_side: str = "left",
                 scale_factor: int = 8):
        if text_encoder_hidden_states.ndim == 3:
            b, s, _ = text_encoder_hidden_states.shape
            text_encoder_hidden_states = text_encoder_hidden_states.reshape(
                b, s, self.config.caption_channels, -1
            )

        if self.config.per_modality_projections:
            normed = per_token_rms_norm(text_encoder_hidden_states)
            b, s = normed.shape[:2]
            normed = normed.reshape(b, s, -1)
            bool_mask = attention_mask.astype(bool)[..., None]
            normed = jnp.where(bool_mask, normed, 0.0)
            video_scale = math.sqrt(self.config.video_hidden_dim / self.config.caption_channels)
            audio_scale = math.sqrt(self.config.audio_hidden_dim / self.config.caption_channels)
            video_proj = self.video_text_proj_in(params["video_text_proj_in"], normed * video_scale)
            audio_proj = self.audio_text_proj_in(params["audio_text_proj_in"], normed * audio_scale)
        else:
            seq_lens = attention_mask.sum(axis=-1)
            normed = per_layer_masked_mean_norm(
                text_encoder_hidden_states, seq_lens,
                padding_side=padding_side, scale_factor=scale_factor,
            )
            proj = self.text_proj_in(params["text_proj_in"], normed)
            video_proj = audio_proj = proj

        dtype = video_proj.dtype
        add_mask = (attention_mask.astype(jnp.int32) - 1).astype(jnp.float32)
        add_mask = add_mask.reshape(add_mask.shape[0], 1, 1, add_mask.shape[-1])
        add_mask = add_mask * float(jnp.finfo(dtype).max)

        video_emb, video_mask = self.video_connector(params["video_connector"], video_proj, add_mask)
        binary = (video_mask < 1e-6).astype(jnp.int32)
        binary = binary.reshape(video_emb.shape[0], video_emb.shape[1], 1)
        video_emb = video_emb * binary
        audio_emb, _ = self.audio_connector(params["audio_connector"], audio_proj, add_mask)
        return video_emb, audio_emb, binary[..., 0]
