"""ChatGLM3 text encoder for Kolors.

Behavioral mirror of the reference `pipelines/kolors/text_encoder.py`:
RMSNorm blocks (`:92`), combined query_key_value projection with optional
multi-query attention (`:283`), interleaved rotary on the FIRST HALF of
each head (`apply_rotary_pos_emb` `:262`: rot_dim = kv_channels/2 pairs),
swiglu MLP (`:424` — h→2·ffn, silu(x0)·x1), causal+padding mask semantics
from `get_masks` (`:626`: allowed = (causal ∧ key-kept) ∨ query-is-pad),
and per-layer hidden-state collection ([input to each layer, final
pre-LN output]).

TPU-first: [B, S, H] layout throughout (the reference shuttles [S, B, H]
for megatron heritage; the pipeline permutes back — we skip both)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...models.modeling_utils import ModelMixin
from ...ops.module import Embedding, LayerNorm, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput


@dataclass
class ChatGLMModelOutput(BaseOutput):
    last_hidden_state: jax.Array
    hidden_states: Optional[Tuple[jax.Array, ...]] = None


def _glm_rotary_cache(seq_len: int, n_elem: int) -> np.ndarray:
    """[S, n_elem/2, 2] cos/sin cache (reference RotaryEmbedding.forward_impl)."""
    theta = 1.0 / (10000 ** (np.arange(0, n_elem, 2, dtype=np.float64) / n_elem))
    idx_theta = np.outer(np.arange(seq_len, dtype=np.float64), theta)
    return np.stack([np.cos(idx_theta), np.sin(idx_theta)], axis=-1).astype(np.float32)


def _apply_glm_rotary(x: jax.Array, rope: jax.Array) -> jax.Array:
    """x: [B, S, H, D]; rope: [S, rot/2, 2]. Interleaved pairs on the first
    rot dims, rest passthrough."""
    rot_dim = rope.shape[-2] * 2
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    B, S, H, _ = x_rot.shape
    xs = x_rot.astype(jnp.float32).reshape(B, S, H, rot_dim // 2, 2)
    cos = rope[None, :, None, :, 0]
    sin = rope[None, :, None, :, 1]
    out = jnp.stack(
        [xs[..., 0] * cos - xs[..., 1] * sin, xs[..., 1] * cos + xs[..., 0] * sin], axis=-1
    ).reshape(B, S, H, rot_dim)
    return jnp.concatenate([out.astype(x.dtype), x_pass], axis=-1)


class _GLMSelfAttention(Module):
    def __init__(self, config):
        super().__init__()
        self.projection_size = config["kv_channels"] * config["num_attention_heads"]
        self.head_dim = self.projection_size // config["num_attention_heads"]
        self.num_heads = config["num_attention_heads"]
        self.multi_query_attention = config["multi_query_attention"]
        self.num_kv = config["multi_query_group_num"] if self.multi_query_attention else self.num_heads
        qkv_size = self.projection_size + 2 * self.head_dim * self.num_kv
        bias_qkv = config["add_bias_linear"] or config["add_qkv_bias"]
        self.query_key_value = Linear(config["hidden_size"], qkv_size, use_bias=bias_qkv)
        self.dense = Linear(self.projection_size, config["hidden_size"], use_bias=config["add_bias_linear"])

    def __call__(self, params: Params, x: jax.Array, allowed: jax.Array, rope: jax.Array) -> jax.Array:
        B, S, _ = x.shape
        mixed = self.query_key_value(params["query_key_value"], x)
        q, k, v = jnp.split(
            mixed,
            [self.num_heads * self.head_dim, self.num_heads * self.head_dim + self.num_kv * self.head_dim],
            axis=-1,
        )
        q = q.reshape(B, S, self.num_heads, self.head_dim)
        k = k.reshape(B, S, self.num_kv, self.head_dim)
        v = v.reshape(B, S, self.num_kv, self.head_dim)
        q = _apply_glm_rotary(q, rope)
        k = _apply_glm_rotary(k, rope)
        if self.num_kv != self.num_heads:
            rep = self.num_heads // self.num_kv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        q = jnp.transpose(q, (0, 2, 1, 3))
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.asarray(self.head_dim, q.dtype))
        big_neg = jnp.finfo(jnp.float32).min
        scores = jnp.where(allowed[:, None], scores, big_neg)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(B, S, self.projection_size)
        return self.dense(params["dense"], ctx)


class _GLMMLP(Module):
    def __init__(self, config):
        super().__init__()
        self.dense_h_to_4h = Linear(config["hidden_size"], config["ffn_hidden_size"] * 2,
                                    use_bias=config["add_bias_linear"])
        self.dense_4h_to_h = Linear(config["ffn_hidden_size"], config["hidden_size"],
                                    use_bias=config["add_bias_linear"])

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.dense_h_to_4h(params["dense_h_to_4h"], x)
        x0, x1 = jnp.split(x, 2, axis=-1)
        return self.dense_4h_to_h(params["dense_4h_to_h"], jax.nn.silu(x0) * x1)


class _GLMBlock(Module):
    def __init__(self, config):
        super().__init__()
        norm_cls = RMSNorm if config["rmsnorm"] else LayerNorm
        eps = config["layernorm_epsilon"]
        self.input_layernorm = norm_cls(config["hidden_size"], eps=eps)
        self.self_attention = _GLMSelfAttention(config)
        self.post_attention_layernorm = norm_cls(config["hidden_size"], eps=eps)
        self.mlp = _GLMMLP(config)

    def __call__(self, params: Params, x: jax.Array, allowed: jax.Array, rope: jax.Array) -> jax.Array:
        attn_out = self.self_attention(
            params["self_attention"], self.input_layernorm(params["input_layernorm"], x), allowed, rope
        )
        x = x + attn_out
        mlp_out = self.mlp(params["mlp"], self.post_attention_layernorm(params["post_attention_layernorm"], x))
        return x + mlp_out


class _GLMEmbedding(Module):
    def __init__(self, vocab_size, hidden_size):
        super().__init__()
        self.word_embeddings = Embedding(vocab_size, hidden_size)

    def __call__(self, params: Params, ids: jax.Array) -> jax.Array:
        return self.word_embeddings(params["word_embeddings"], ids)


class _GLMTransformer(Module):
    def __init__(self, config):
        super().__init__()
        self.num_layers = config["num_layers"]
        self.post_layer_norm = config["post_layer_norm"]
        self.layers = ModuleList([_GLMBlock(config) for _ in range(self.num_layers)])
        if self.post_layer_norm:
            norm_cls = RMSNorm if config["rmsnorm"] else LayerNorm
            self.final_layernorm = norm_cls(config["hidden_size"], eps=config["layernorm_epsilon"])

    def __call__(self, params: Params, x: jax.Array, allowed: jax.Array, rope: jax.Array,
                 output_hidden_states: bool = False):
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(x)
            x = layer(params["layers"][i], x, allowed, rope)
        if output_hidden_states:
            all_hidden.append(x)
        if self.post_layer_norm:
            x = self.final_layernorm(params["final_layernorm"], x)
        return x, (tuple(all_hidden) if output_hidden_states else None)


class ChatGLMModel(Module, ModelMixin, ConfigMixin):
    """Reference ChatGLMModel :746 — encoder-only usage for Kolors."""

    @register_to_config
    def __init__(
        self,
        num_layers: int = 28,
        padded_vocab_size: int = 65024,
        hidden_size: int = 4096,
        ffn_hidden_size: int = 13696,
        kv_channels: int = 128,
        num_attention_heads: int = 32,
        seq_length: int = 2048,
        layernorm_epsilon: float = 1e-5,
        rmsnorm: bool = True,
        post_layer_norm: bool = True,
        add_bias_linear: bool = False,
        add_qkv_bias: bool = True,
        multi_query_attention: bool = True,
        multi_query_group_num: int = 2,
        **kwargs,
    ):
        super().__init__()
        cfg = dict(
            num_layers=num_layers, hidden_size=hidden_size, ffn_hidden_size=ffn_hidden_size,
            kv_channels=kv_channels, num_attention_heads=num_attention_heads,
            layernorm_epsilon=layernorm_epsilon, rmsnorm=rmsnorm, post_layer_norm=post_layer_norm,
            add_bias_linear=add_bias_linear, add_qkv_bias=add_qkv_bias,
            multi_query_attention=multi_query_attention, multi_query_group_num=multi_query_group_num,
        )
        self.seq_length = seq_length
        self.kv_channels = kv_channels
        self.embedding = _GLMEmbedding(padded_vocab_size, hidden_size)
        self.encoder = _GLMTransformer(cfg)
        self.output_layer = Linear(hidden_size, padded_vocab_size, use_bias=False)

    def __call__(
        self,
        params: Params,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        output_hidden_states: bool = False,
    ) -> ChatGLMModelOutput:
        B, S = input_ids.shape
        x = self.embedding(params["embedding"], input_ids)

        causal = jnp.tril(jnp.ones((S, S), dtype=bool))
        if attention_mask is not None:
            pad = attention_mask.astype(bool)
            # allowed = (causal AND key kept) OR (query itself is padding)
            allowed = (causal[None] & pad[:, None, :]) | (~pad)[:, :, None]
        else:
            allowed = jnp.broadcast_to(causal[None], (B, S, S))

        rope = jnp.asarray(_glm_rotary_cache(S, self.kv_channels // 2))
        x, all_hidden = self.encoder(
            params["encoder"], x, allowed, rope, output_hidden_states=output_hidden_states
        )
        return ChatGLMModelOutput(last_hidden_state=x, hidden_states=all_hidden)
