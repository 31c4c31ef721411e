"""AceStepTransformer1DModel — ACE-Step 1.5 music-generation DiT.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/models/transformers/ace_step_transformer.py:432`;
AceStepTransformerBlock `:337`, AceStepAttention `:268`, dual-timestep
embedding `:147`, Qwen3-layout RoPE `:115`, sliding-window mask `:72`).

TPU-first notes: the per-layer sliding-window band mask is a static
[1, 1, S, S] boolean computed once per trace from broadcasted iotas (no
dynamic shapes); GQA repeats K/V heads before the fused attention dispatch
(a broadcast XLA folds into the QK matmul); the RoPE table is built
host-side in float64 numpy once per sequence length.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Conv1d, ConvTranspose1d, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..embeddings import Timesteps, get_1d_rotary_pos_embed_np
from ..modeling_utils import ModelMixin


@dataclass
class Transformer1DModelOutput(BaseOutput):
    sample: jax.Array


def ace_step_rotary_freqs(seq_len: int, head_dim: int, theta: float) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side (cos, sin) table in the Qwen3 concat-half layout
    (reference `_ace_step_rotary_freqs` :115): freqs = cat([f, f], -1)."""
    pos = np.arange(seq_len, dtype=np.float32)
    return get_1d_rotary_pos_embed_np(head_dim, pos, theta=theta, repeat_interleave_real=False)


def apply_rotary_emb_half(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half convention (reference apply_rotary_emb with
    use_real_unbind_dim=-2): split last dim in two halves. x: [B, S, H, D]."""
    x_f = x.astype(jnp.float32)
    x1, x2 = jnp.split(x_f, 2, axis=-1)
    x_rot = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    return (x_f * cos + x_rot * sin).astype(x.dtype)


def sliding_window_mask(seq_len: int, window: int, is_causal: bool = False) -> jax.Array:
    """Static [1, 1, S, S] keep-mask: |i - j| <= window (reference
    `_create_4d_mask` :72 with is_sliding_window=True)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    diff = i - j
    keep = jnp.ones((seq_len, seq_len), dtype=bool)
    if is_causal:
        keep = keep & (diff >= 0) & (diff <= window)
    else:
        keep = keep & (jnp.abs(diff) <= window)
    return keep[None, None]


class AceStepMLP(Module):
    """SwiGLU MLP (reference AceStepMLP :135)."""

    def __init__(self, hidden_size: int, intermediate_size: int):
        super().__init__()
        self.gate_proj = Linear(hidden_size, intermediate_size, use_bias=False)
        self.up_proj = Linear(hidden_size, intermediate_size, use_bias=False)
        self.down_proj = Linear(intermediate_size, hidden_size, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.down_proj(
            params["down_proj"],
            jax.nn.silu(self.gate_proj(params["gate_proj"], x)) * self.up_proj(params["up_proj"], x),
        )


class AceStepTimestepEmbedding(Module):
    """Sinusoid + 2-layer MLP + 6-way AdaLN projection (reference :147)."""

    def __init__(self, in_channels: int = 256, time_embed_dim: int = 2048, scale: float = 1000.0):
        super().__init__()
        self.scale = scale
        self.time_embed_dim = time_embed_dim
        self.time_sinusoid = Timesteps(num_channels=in_channels, flip_sin_to_cos=True, downscale_freq_shift=0)
        self.linear_1 = Linear(in_channels, time_embed_dim)
        self.linear_2 = Linear(time_embed_dim, time_embed_dim)
        self.time_proj = Linear(time_embed_dim, time_embed_dim * 6)

    def __call__(self, params: Params, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
        t_freq = self.time_sinusoid({}, t * self.scale)
        temb = self.linear_1(params["linear_1"], t_freq.astype(t.dtype))
        temb = self.linear_2(params["linear_2"], jax.nn.silu(temb))
        proj = self.time_proj(params["time_proj"], jax.nn.silu(temb))
        return temb, proj.reshape(proj.shape[0], 6, self.time_embed_dim)


class AceStepAttention(Module):
    """GQA attention with per-head RMSNorm on q/k (reference :268).

    Self-attention applies rotate-half RoPE; cross-attention reads K/V from
    `encoder_hidden_states` with no RoPE.
    """

    def __init__(
        self,
        hidden_size: int,
        num_attention_heads: int,
        num_key_value_heads: int,
        head_dim: int,
        bias: bool = False,
        eps: float = 1e-6,
        sliding_window: Optional[int] = None,
        is_cross_attention: bool = False,
    ):
        super().__init__()
        self.heads = num_attention_heads
        self.kv_heads = num_key_value_heads
        self.head_dim = head_dim
        self.scaling = head_dim**-0.5
        self.sliding_window = sliding_window
        self.is_cross_attention = is_cross_attention

        self.to_q = Linear(hidden_size, num_attention_heads * head_dim, use_bias=bias)
        self.to_k = Linear(hidden_size, num_key_value_heads * head_dim, use_bias=bias)
        self.to_v = Linear(hidden_size, num_key_value_heads * head_dim, use_bias=bias)
        self.to_out = ModuleList([Linear(num_attention_heads * head_dim, hidden_size, use_bias=bias)])
        self.norm_q = RMSNorm(head_dim, eps=eps)
        self.norm_k = RMSNorm(head_dim, eps=eps)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        rotary_emb: Optional[Tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        b = hidden_states.shape[0]
        is_cross = self.is_cross_attention and encoder_hidden_states is not None
        kv_input = encoder_hidden_states if is_cross else hidden_states

        q = self.to_q(params["to_q"], hidden_states).reshape(b, -1, self.heads, self.head_dim)
        k = self.to_k(params["to_k"], kv_input).reshape(b, -1, self.kv_heads, self.head_dim)
        v = self.to_v(params["to_v"], kv_input).reshape(b, -1, self.kv_heads, self.head_dim)
        q = self.norm_q(params["norm_q"], q)
        k = self.norm_k(params["norm_k"], k)

        if not is_cross and rotary_emb is not None:
            cos, sin = rotary_emb
            q = apply_rotary_emb_half(q, cos, sin)
            k = apply_rotary_emb_half(k, cos, sin)

        if self.kv_heads != self.heads:
            rep = self.heads // self.kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        out = dispatch_attention_fn(q, k, v, attn_mask=attention_mask, scale=self.scaling)
        out = out.reshape(b, -1, self.heads * self.head_dim).astype(q.dtype)
        return self.to_out[0](params["to_out"][0], out)


class AceStepTransformerBlock(Module):
    """self-attn (AdaLN) → cross-attn → MLP (AdaLN) (reference :337)."""

    def __init__(
        self,
        hidden_size: int,
        num_attention_heads: int,
        num_key_value_heads: int,
        head_dim: int,
        intermediate_size: int,
        attention_bias: bool = False,
        rms_norm_eps: float = 1e-6,
        sliding_window: Optional[int] = None,
        use_cross_attention: bool = True,
    ):
        super().__init__()
        self.hidden_size = hidden_size
        self.self_attn_norm = RMSNorm(hidden_size, eps=rms_norm_eps)
        self.self_attn = AceStepAttention(
            hidden_size, num_attention_heads, num_key_value_heads, head_dim,
            bias=attention_bias, eps=rms_norm_eps, sliding_window=sliding_window,
            is_cross_attention=False,
        )
        self.use_cross_attention = use_cross_attention
        if use_cross_attention:
            self.cross_attn_norm = RMSNorm(hidden_size, eps=rms_norm_eps)
            self.cross_attn = AceStepAttention(
                hidden_size, num_attention_heads, num_key_value_heads, head_dim,
                bias=attention_bias, eps=rms_norm_eps, is_cross_attention=True,
            )
        self.mlp_norm = RMSNorm(hidden_size, eps=rms_norm_eps)
        self.mlp = AceStepMLP(hidden_size, intermediate_size)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 11)
        params["scale_shift_table"] = (
            jax.random.normal(k, (1, 6, self.hidden_size), jnp.float32) / self.hidden_size**0.5
        ).astype(dtype)
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        position_embeddings: Tuple[jax.Array, jax.Array],
        temb: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        encoder_hidden_states: Optional[jax.Array] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        mods = params["scale_shift_table"].astype(jnp.float32) + temb.astype(jnp.float32)
        shift_msa, scale_msa, gate_msa, c_shift_msa, c_scale_msa, c_gate_msa = jnp.split(mods, 6, axis=1)
        dtype = hidden_states.dtype

        norm_h = (
            self.self_attn_norm(params["self_attn_norm"], hidden_states).astype(jnp.float32)
            * (1 + scale_msa) + shift_msa
        ).astype(dtype)
        attn_out = self.self_attn(
            params["self_attn"], norm_h, attention_mask=attention_mask,
            rotary_emb=position_embeddings,
        )
        hidden_states = (hidden_states + attn_out * gate_msa.astype(dtype)).astype(dtype)

        if self.use_cross_attention and encoder_hidden_states is not None:
            norm_h = self.cross_attn_norm(params["cross_attn_norm"], hidden_states).astype(dtype)
            attn_out = self.cross_attn(
                params["cross_attn"], norm_h, encoder_hidden_states=encoder_hidden_states,
                attention_mask=encoder_attention_mask,
            )
            hidden_states = hidden_states + attn_out

        norm_h = (
            self.mlp_norm(params["mlp_norm"], hidden_states).astype(jnp.float32)
            * (1 + c_scale_msa) + c_shift_msa
        ).astype(dtype)
        ff = self.mlp(params["mlp"], norm_h)
        hidden_states = (hidden_states + ff * c_gate_msa.astype(dtype)).astype(dtype)
        return hidden_states


class AceStepTransformer1DModel(Module, ModelMixin, ConfigMixin):
    """ACE-Step 1.5 DiT (reference AceStepTransformer1DModel :432).

    1D patchify conv over `cat([context_latents, hidden_states], -1)`,
    dual-timestep (mean-flow) AdaLN conditioning, alternating
    sliding/full-attention blocks with cross-attention over the packed
    condition sequence, ConvTranspose1d de-patchify head.
    """

    @register_to_config
    def __init__(
        self,
        hidden_size: int = 2048,
        intermediate_size: int = 6144,
        num_hidden_layers: int = 24,
        num_attention_heads: int = 16,
        num_key_value_heads: int = 8,
        head_dim: int = 128,
        in_channels: int = 192,
        audio_acoustic_hidden_dim: int = 64,
        patch_size: int = 2,
        rope_theta: float = 1000000.0,
        attention_bias: bool = False,
        attention_dropout: float = 0.0,
        rms_norm_eps: float = 1e-6,
        sliding_window: int = 128,
        layer_types: Optional[List[str]] = None,
        encoder_hidden_size: Optional[int] = None,
        is_turbo: bool = False,
        model_version: Optional[str] = None,
    ):
        super().__init__()
        if encoder_hidden_size is None:
            encoder_hidden_size = hidden_size
        self.patch_size = patch_size
        self.head_dim = head_dim
        self.rope_theta = rope_theta
        self.hidden_size = hidden_size

        if layer_types is None:
            layer_types = [
                "sliding_attention" if bool((i + 1) % 2) else "full_attention"
                for i in range(num_hidden_layers)
            ]
        self.layer_types = list(layer_types)

        self.layers = ModuleList(
            [
                AceStepTransformerBlock(
                    hidden_size=hidden_size,
                    num_attention_heads=num_attention_heads,
                    num_key_value_heads=num_key_value_heads,
                    head_dim=head_dim,
                    intermediate_size=intermediate_size,
                    attention_bias=attention_bias,
                    rms_norm_eps=rms_norm_eps,
                    sliding_window=sliding_window if layer_types[i] == "sliding_attention" else None,
                    use_cross_attention=True,
                )
                for i in range(num_hidden_layers)
            ]
        )
        self.proj_in_conv = Conv1d(in_channels, hidden_size, kernel_size=patch_size,
                                   stride=patch_size, padding=0)
        self.time_embed = AceStepTimestepEmbedding(in_channels=256, time_embed_dim=hidden_size)
        self.time_embed_r = AceStepTimestepEmbedding(in_channels=256, time_embed_dim=hidden_size)
        self.condition_embedder = Linear(encoder_hidden_size, hidden_size, use_bias=True)
        self.norm_out = RMSNorm(hidden_size, eps=rms_norm_eps)
        self.proj_out_conv = ConvTranspose1d(hidden_size, audio_acoustic_hidden_dim,
                                             kernel_size=patch_size, stride=patch_size, padding=0)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        k = jax.random.fold_in(key, 13)
        params["scale_shift_table"] = (
            jax.random.normal(k, (1, 2, self.hidden_size), jnp.float32) / self.hidden_size**0.5
        ).astype(dtype)
        return params

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        timestep: jax.Array,
        timestep_r: jax.Array,
        encoder_hidden_states: jax.Array,
        context_latents: jax.Array,
        encoder_attention_mask: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        temb_t, proj_t = self.time_embed(params["time_embed"], timestep)
        temb_r, proj_r = self.time_embed_r(params["time_embed_r"], timestep - timestep_r)
        temb = temb_t + temb_r
        timestep_proj = proj_t + proj_r

        hidden_states = jnp.concatenate([context_latents, hidden_states], axis=-1)
        original_seq_len = hidden_states.shape[1]
        if original_seq_len % self.patch_size != 0:
            pad = self.patch_size - (original_seq_len % self.patch_size)
            hidden_states = jnp.pad(hidden_states, ((0, 0), (0, pad), (0, 0)))
        hidden_states = self.proj_in_conv(params["proj_in_conv"], hidden_states)
        encoder_hidden_states = self.condition_embedder(params["condition_embedder"], encoder_hidden_states)

        seq_len = hidden_states.shape[1]
        cos, sin = ace_step_rotary_freqs(seq_len, self.head_dim, self.rope_theta)
        position_embeddings = (jnp.asarray(cos, hidden_states.dtype), jnp.asarray(sin, hidden_states.dtype))

        band_mask = sliding_window_mask(seq_len, self.config.sliding_window)
        # key-padding mask for cross-attention: [B, 1, 1, S_enc] bool keep
        cross_mask = None
        if encoder_attention_mask is not None:
            cross_mask = encoder_attention_mask.astype(bool)[:, None, None, :]

        for i, layer in enumerate(self.layers):
            layer_mask = band_mask if self.layer_types[i] == "sliding_attention" else None
            hidden_states = layer(
                params["layers"][i], hidden_states, position_embeddings, timestep_proj,
                attention_mask=layer_mask, encoder_hidden_states=encoder_hidden_states,
                encoder_attention_mask=cross_mask,
            )

        shift, scale = jnp.split(
            params["scale_shift_table"].astype(jnp.float32) + temb.astype(jnp.float32)[:, None], 2, axis=1
        )
        hidden_states = (
            self.norm_out(params["norm_out"], hidden_states).astype(jnp.float32) * (1 + scale) + shift
        ).astype(hidden_states.dtype)
        hidden_states = self.proj_out_conv(params["proj_out_conv"], hidden_states)
        hidden_states = hidden_states[:, :original_seq_len, :]

        if not return_dict:
            return (hidden_states,)
        return Transformer1DModelOutput(sample=hidden_states)
