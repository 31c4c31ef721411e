"""StableAudioDiTModel — the Stable Audio Open diffusion transformer.

Behavioral mirror of the reference
`models/transformers/stable_audio_transformer.py` (Gaussian-Fourier time
proj `:32` (log=False, flip_sin_to_cos), StableAudioDiTBlock `:64`
(pre-LN self-attn with partial half-split RoPE → GQA cross-attn → swiglu
FF), StableAudioDiTModel `:183`: Sequential timestep/global/cross
projections, 1x1 pre/post convs with residual, global token prepended to
the audio sequence) and `attention_processor.StableAudioAttnProcessor2_0`
`:2991` (partial rotary on q, and on k for self-attn only; KV heads
repeated to query heads for GQA).

TPU-first: the token sequence is static ([1 global] + [latent frames]);
attention runs as one batched bf16-friendly einsum per block.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Conv1d, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..attention_blocks import FeedForward
from ..embeddings import GaussianFourierProjection
from ..modeling_utils import ModelMixin


@dataclass
class Transformer2DModelOutput(BaseOutput):
    sample: jax.Array


class _SiLU(Module):
    def init(self, key, dtype=jnp.float32) -> Params:
        return {}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return jax.nn.silu(x)


def _apply_partial_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Half-split rotary on the first `rot_dim` head dims, rest untouched
    (reference StableAudioAttnProcessor2_0.apply_partial_rotary_emb :3003,
    apply_rotary_emb use_real_unbind_dim=-2). x: [B, H, S, D]; cos/sin:
    [S, rot_dim] with the two halves duplicated."""
    rot_dim = cos.shape[-1]
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    x_f = x_rot.astype(jnp.float32)
    x1, x2 = jnp.split(x_f, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    out = x_f * cos[None, None] + rotated * sin[None, None]
    return jnp.concatenate([out.astype(x.dtype), x_pass], axis=-1)


class _StableAudioAttention(Module):
    """MHA/GQA attention, qkv/out bias-free."""

    def __init__(self, query_dim: int, heads: int, dim_head: int, kv_heads: Optional[int] = None,
                 cross_attention_dim: Optional[int] = None):
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
        self.to_out = ModuleList([Linear(inner, query_dim, use_bias=False)])

    def __call__(self, params: Params, hidden_states: jax.Array,
                 encoder_hidden_states: Optional[jax.Array] = None,
                 attention_mask: Optional[jax.Array] = None,
                 rotary_embedding=None) -> jax.Array:
        B, S, _ = hidden_states.shape
        kv_src = encoder_hidden_states if encoder_hidden_states is not None else hidden_states
        q = self.to_q(params["to_q"], hidden_states).reshape(B, S, self.heads, self.dim_head)
        k = self.to_k(params["to_k"], kv_src).reshape(B, kv_src.shape[1], self.kv_heads, self.dim_head)
        v = self.to_v(params["to_v"], kv_src).reshape(B, kv_src.shape[1], self.kv_heads, self.dim_head)
        q = jnp.transpose(q, (0, 2, 1, 3))
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))
        if self.kv_heads != self.heads:
            rep = self.heads // self.kv_heads
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        if rotary_embedding is not None:
            cos, sin = rotary_embedding
            q = _apply_partial_rope(q, cos, sin)
            if encoder_hidden_states is None:
                k = _apply_partial_rope(k, cos, sin)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(self.dim_head, q.dtype))
        if attention_mask is not None:
            big_neg = jnp.finfo(scores.dtype).min
            scores = jnp.where(attention_mask[:, None, None, :].astype(bool), scores, big_neg)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, S, self.heads * self.dim_head)
        return self.to_out[0](params["to_out"][0], out)


class StableAudioDiTBlock(Module):
    """Pre-LN self-attn (partial RoPE) → GQA cross-attn → swiglu FF
    (reference StableAudioDiTBlock :64)."""

    def __init__(self, dim: int, num_attention_heads: int, num_key_value_attention_heads: int,
                 attention_head_dim: int, cross_attention_dim: Optional[int] = None,
                 norm_eps: float = 1e-5, ff_inner_dim: Optional[int] = None):
        super().__init__()
        self.norm1 = LayerNorm(dim, eps=norm_eps)
        self.attn1 = _StableAudioAttention(dim, num_attention_heads, attention_head_dim)
        self.norm2 = LayerNorm(dim, eps=norm_eps)
        self.attn2 = _StableAudioAttention(
            dim, num_attention_heads, attention_head_dim,
            kv_heads=num_key_value_attention_heads, cross_attention_dim=cross_attention_dim,
        )
        self.norm3 = LayerNorm(dim, eps=norm_eps)
        self.ff = FeedForward(dim, activation_fn="swiglu", inner_dim=ff_inner_dim, bias=True)

    def __call__(self, params: Params, hidden_states: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 encoder_hidden_states: Optional[jax.Array] = None,
                 encoder_attention_mask: Optional[jax.Array] = None,
                 rotary_embedding=None) -> jax.Array:
        norm_hs = self.norm1(params["norm1"], hidden_states)
        hidden_states = hidden_states + self.attn1(
            params["attn1"], norm_hs, attention_mask=attention_mask, rotary_embedding=rotary_embedding
        )
        norm_hs = self.norm2(params["norm2"], hidden_states)
        hidden_states = hidden_states + self.attn2(
            params["attn2"], norm_hs, encoder_hidden_states=encoder_hidden_states,
            attention_mask=encoder_attention_mask,
        )
        norm_hs = self.norm3(params["norm3"], hidden_states)
        return hidden_states + self.ff(params["ff"], norm_hs)


class StableAudioDiTModel(Module, ModelMixin, ConfigMixin):
    """Reference StableAudioDiTModel :183. Input/output latents are NCL
    ([B, in_channels, frames]); internally NLC."""

    @register_to_config
    def __init__(
        self,
        sample_size: int = 1024,
        in_channels: int = 64,
        num_layers: int = 24,
        attention_head_dim: int = 64,
        num_attention_heads: int = 24,
        num_key_value_attention_heads: int = 12,
        out_channels: int = 64,
        cross_attention_dim: int = 768,
        time_proj_dim: int = 256,
        global_states_input_dim: int = 1536,
        cross_attention_input_dim: int = 768,
    ):
        super().__init__()
        self.sample_size = sample_size
        self.out_channels = out_channels
        self.inner_dim = num_attention_heads * attention_head_dim

        self.time_proj = GaussianFourierProjection(
            embedding_size=time_proj_dim // 2, flip_sin_to_cos=True, log=False
        )
        self.timestep_proj = ModuleList([
            Linear(time_proj_dim, self.inner_dim, use_bias=True), _SiLU(),
            Linear(self.inner_dim, self.inner_dim, use_bias=True),
        ])
        self.global_proj = ModuleList([
            Linear(global_states_input_dim, self.inner_dim, use_bias=False), _SiLU(),
            Linear(self.inner_dim, self.inner_dim, use_bias=False),
        ])
        self.cross_attention_proj = ModuleList([
            Linear(cross_attention_input_dim, cross_attention_dim, use_bias=False), _SiLU(),
            Linear(cross_attention_dim, cross_attention_dim, use_bias=False),
        ])

        self.preprocess_conv = Conv1d(in_channels, in_channels, kernel_size=1, use_bias=False)
        self.proj_in = Linear(in_channels, self.inner_dim, use_bias=False)
        self.transformer_blocks = ModuleList([
            StableAudioDiTBlock(
                dim=self.inner_dim,
                num_attention_heads=num_attention_heads,
                num_key_value_attention_heads=num_key_value_attention_heads,
                attention_head_dim=attention_head_dim,
                cross_attention_dim=cross_attention_dim,
            )
            for _ in range(num_layers)
        ])
        self.proj_out = Linear(self.inner_dim, self.out_channels, use_bias=False)
        self.postprocess_conv = Conv1d(self.out_channels, self.out_channels, kernel_size=1, use_bias=False)

    def _seq(self, mods: ModuleList, params, x: jax.Array) -> jax.Array:
        for i, m in enumerate(mods):
            x = m(params.get(i, {}), x)
        return x

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        timestep: jax.Array = None,
        encoder_hidden_states: jax.Array = None,
        global_hidden_states: jax.Array = None,
        rotary_embedding=None,
        return_dict: bool = True,
        attention_mask: Optional[jax.Array] = None,
        encoder_attention_mask: Optional[jax.Array] = None,
    ):
        cross_hs = self._seq(self.cross_attention_proj, params["cross_attention_proj"], encoder_hidden_states)
        global_hs = self._seq(self.global_proj, params["global_proj"], global_hidden_states)
        t = jnp.atleast_1d(jnp.asarray(timestep)).astype(jnp.float32)
        time_hs = self._seq(
            self.timestep_proj, params["timestep_proj"],
            self.time_proj(params["time_proj"], t).astype(hidden_states.dtype),
        )
        global_hs = global_hs + time_hs[:, None, :]

        x = jnp.transpose(hidden_states, (0, 2, 1))  # NCL -> NLC
        x = self.preprocess_conv(params["preprocess_conv"], x) + x
        x = self.proj_in(params["proj_in"], x)

        x = jnp.concatenate([global_hs, x], axis=-2)
        if attention_mask is not None:
            prepend = jnp.ones((x.shape[0], 1), dtype=attention_mask.dtype)
            attention_mask = jnp.concatenate([prepend, attention_mask], axis=-1)

        for i, block in enumerate(self.transformer_blocks):
            x = block(
                params["transformer_blocks"][i], x,
                attention_mask=attention_mask,
                encoder_hidden_states=cross_hs,
                encoder_attention_mask=encoder_attention_mask,
                rotary_embedding=rotary_embedding,
            )

        x = self.proj_out(params["proj_out"], x)
        x = x[:, 1:]  # drop the prepended global token
        x = self.postprocess_conv(params["postprocess_conv"], x) + x
        out = jnp.transpose(x, (0, 2, 1))  # NLC -> NCL

        if not return_dict:
            return (out,)
        return Transformer2DModelOutput(sample=out)
