"""Gemma-2 text encoder (SANA's prompt encoder) — native JAX implementation.

Round 1 outsourced Sana's text encoding to a host-side torch Gemma; this is
the TPU-native replacement, checkpoint-compatible with transformers'
`Gemma2Model` state dict (the reference Sana pipeline crosses into
transformers at `/root/reference/src/diffusers/pipelines/sana/pipeline_sana.py`
encode_prompt). Decoder-only causal LM trunk used as an encoder (last hidden
states):

  * embeddings scaled by sqrt(hidden_size)
  * zero-centered RMSNorm ((1 + w) · x̂, eps 1e-6)
  * GQA attention with RoPE (theta 1e4), query_pre_attn_scalar scaling and
    attn-logit softcapping; sliding-window layers are exact for prompt
    lengths ≤ window (Sana uses ≤ 300 tokens, window 4096)
  * pre/post norms around both attention and MLP (Gemma-2 sandwich)
  * GeGLU MLP with tanh-approximated gelu
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Embedding, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin, convert_torch_state_dict


@dataclass
class GemmaEncoderOutput(BaseOutput):
    last_hidden_state: jax.Array
    hidden_states: Optional[list] = None


class GemmaRMSNorm(Module):
    """Zero-centered RMSNorm: x̂ · (1 + w) in float32 (transformers Gemma2RMSNorm)."""

    def __init__(self, dim: int, eps: float = 1e-6):
        super().__init__()
        self.dim = dim
        self.eps = eps

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"weight": jnp.zeros((self.dim,), dtype)}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps)
        return (xf * (1.0 + params["weight"].astype(jnp.float32))).astype(dtype)


def _rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """x: [B, S, H, D] — half-split RoPE (transformers LLaMA/Gemma convention)."""
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    angles = positions.astype(jnp.float32)[:, :, None] * freqs[None, None, :]  # [B, S, D/2]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    return jnp.concatenate([xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1).astype(x.dtype)


class GemmaAttention(Module):
    def __init__(self, hidden_size, num_heads, num_kv_heads, head_dim, query_pre_attn_scalar,
                 attn_logit_softcapping, rope_theta):
        super().__init__()
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.scale = query_pre_attn_scalar**-0.5
        self.softcap = attn_logit_softcapping
        self.rope_theta = rope_theta
        self.q_proj = Linear(hidden_size, num_heads * head_dim, use_bias=False)
        self.k_proj = Linear(hidden_size, num_kv_heads * head_dim, use_bias=False)
        self.v_proj = Linear(hidden_size, num_kv_heads * head_dim, use_bias=False)
        self.o_proj = Linear(num_heads * head_dim, hidden_size, use_bias=False)

    def __call__(self, params: Params, x: jax.Array, positions: jax.Array,
                 attention_mask: Optional[jax.Array]) -> jax.Array:
        b, s, _ = x.shape
        q = self.q_proj(params["q_proj"], x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], x).reshape(b, s, self.num_kv_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], x).reshape(b, s, self.num_kv_heads, self.head_dim)
        q = _rope(q, positions, self.rope_theta)
        k = _rope(k, positions, self.rope_theta)
        if self.num_kv_heads != self.num_heads:
            rep = self.num_heads // self.num_kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * self.scale
        if self.softcap is not None:
            logits = jnp.tanh(logits / self.softcap) * self.softcap
        causal = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(causal[None, None], logits, -2.3819763e38)
        if attention_mask is not None:
            keep = attention_mask[:, None, None, :].astype(bool)
            logits = jnp.where(keep, logits, -2.3819763e38)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)
        return self.o_proj(params["o_proj"], out)


class GemmaMLP(Module):
    def __init__(self, hidden_size, intermediate_size):
        super().__init__()
        self.gate_proj = Linear(hidden_size, intermediate_size, use_bias=False)
        self.up_proj = Linear(hidden_size, intermediate_size, use_bias=False)
        self.down_proj = Linear(intermediate_size, hidden_size, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        gate = jax.nn.gelu(self.gate_proj(params["gate_proj"], x), approximate=True)
        return self.down_proj(params["down_proj"], gate * self.up_proj(params["up_proj"], x))


class GemmaDecoderLayer(Module):
    def __init__(self, cfg):
        super().__init__()
        self.self_attn = GemmaAttention(
            cfg["hidden_size"], cfg["num_attention_heads"], cfg["num_key_value_heads"], cfg["head_dim"],
            cfg["query_pre_attn_scalar"], cfg["attn_logit_softcapping"], cfg["rope_theta"],
        )
        self.mlp = GemmaMLP(cfg["hidden_size"], cfg["intermediate_size"])
        self.input_layernorm = GemmaRMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])
        self.post_attention_layernorm = GemmaRMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])
        self.pre_feedforward_layernorm = GemmaRMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])
        self.post_feedforward_layernorm = GemmaRMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])

    def __call__(self, params, x, positions, attention_mask):
        h = self.input_layernorm(params["input_layernorm"], x)
        h = self.self_attn(params["self_attn"], h, positions, attention_mask)
        h = self.post_attention_layernorm(params["post_attention_layernorm"], h)
        x = x + h
        h = self.pre_feedforward_layernorm(params["pre_feedforward_layernorm"], x)
        h = self.mlp(params["mlp"], h)
        h = self.post_feedforward_layernorm(params["post_feedforward_layernorm"], h)
        return x + h


_GEMMA_CONFIG_KEYS = (
    "vocab_size", "hidden_size", "intermediate_size", "num_hidden_layers", "num_attention_heads",
    "num_key_value_heads", "head_dim", "rms_norm_eps", "rope_theta", "query_pre_attn_scalar",
    "attn_logit_softcapping", "sliding_window",
)


class Gemma2Model(Module, ModelMixin, ConfigMixin):
    """transformers-compatible Gemma-2 trunk (prompt lengths must stay ≤
    sliding_window for exactness — true for every Sana config)."""

    @register_to_config
    def __init__(
        self,
        vocab_size: int = 256000,
        hidden_size: int = 2304,
        intermediate_size: int = 9216,
        num_hidden_layers: int = 26,
        num_attention_heads: int = 8,
        num_key_value_heads: int = 4,
        head_dim: int = 256,
        rms_norm_eps: float = 1e-6,
        rope_theta: float = 10000.0,
        query_pre_attn_scalar: float = 256,
        attn_logit_softcapping: Optional[float] = 50.0,
        sliding_window: int = 4096,
    ):
        super().__init__()
        cfg = dict(
            hidden_size=hidden_size, intermediate_size=intermediate_size,
            num_attention_heads=num_attention_heads, num_key_value_heads=num_key_value_heads,
            head_dim=head_dim, rms_norm_eps=rms_norm_eps, rope_theta=rope_theta,
            query_pre_attn_scalar=query_pre_attn_scalar, attn_logit_softcapping=attn_logit_softcapping,
        )
        self.hidden_size = hidden_size
        self.embed_tokens = Embedding(vocab_size, hidden_size)
        self.layers = ModuleList([GemmaDecoderLayer(cfg) for _ in range(num_hidden_layers)])
        self.norm = GemmaRMSNorm(hidden_size, rms_norm_eps)

    def __call__(self, params: Params, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 output_hidden_states: bool = False) -> GemmaEncoderOutput:
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        x = x * jnp.asarray(self.hidden_size**0.5, x.dtype)  # Gemma embedding normalizer
        positions = jnp.broadcast_to(jnp.arange(input_ids.shape[1]), input_ids.shape)
        # transformers layout: [embeddings, after each layer except the last,
        # final post-norm] so hidden_states[-2] is the last layer's INPUT
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(x)
            x = layer(params["layers"][i], x, positions, attention_mask)
        x = self.norm(params["norm"], x)
        if output_hidden_states:
            all_hidden.append(x)
        return GemmaEncoderOutput(last_hidden_state=x, hidden_states=all_hidden)

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, subfolder=None, dtype=None, variant=None, quantization_config=None, **kwargs):
        from safetensors import safe_open

        from ...utils.hub_utils import snapshot_download_repo
        from ...utils.jax_utils import resolve_dtype

        root = str(pretrained_model_name_or_path)
        if not os.path.isdir(root):
            root = snapshot_download_repo(root, **kwargs)
        model_path = os.path.join(root, subfolder) if subfolder else root
        with open(os.path.join(model_path, "config.json")) as f:
            full = json.load(f)
        model = cls(**{k: full[k] for k in _GEMMA_CONFIG_KEYS if k in full})

        index_path = os.path.join(model_path, "model.safetensors.index.json")
        if os.path.isfile(index_path):
            with open(index_path) as f:
                files = sorted(set(json.load(f)["weight_map"].values()))
        else:
            files = ["model.safetensors"]
        state = {}
        for fn in files:
            with safe_open(os.path.join(model_path, fn), framework="numpy") as f:
                for k in f.keys():
                    state[k.removeprefix("model.")] = f.get_tensor(k)
        state.pop("lm_head.weight", None)
        params = convert_torch_state_dict(model, state, dtype=resolve_dtype(dtype, default=None))
        from ...quantizers.quantize import maybe_quantize

        params = maybe_quantize(params, quantization_config)
        return model, params

    def save_pretrained(self, save_directory, params, **kwargs):
        from .clip import _save_transformers_style

        _save_transformers_style(self, save_directory, params)


# ---------------------------------------------------------------------------
# Gemma-3 (LTX-2's text encoder)
# ---------------------------------------------------------------------------


def _rope_tables(positions: jax.Array, head_dim: int, theta: float, factor: float = 1.0):
    """cos/sin half-split tables [B, S, D/2] (transformers Gemma3RotaryEmbedding;
    'linear' rope scaling divides inv_freq by `factor`)."""
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)) / factor
    ang = positions.astype(jnp.float32)[:, :, None] * inv[None, None, :]
    return jnp.cos(ang), jnp.sin(ang)


def _apply_halfsplit_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, S, H, D]; cos/sin [B, S, D/2]."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2].astype(jnp.float32), x[..., d // 2 :].astype(jnp.float32)
    c, s = cos[:, :, None, :], sin[:, :, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1).astype(x.dtype)


class Gemma3Attention(Module):
    """Gemma-3 GQA with per-head q/k RMSNorm and per-layer-type rope
    (transformers Gemma3Attention)."""

    def __init__(self, hidden_size, num_heads, num_kv_heads, head_dim,
                 query_pre_attn_scalar, rms_norm_eps, sliding_window: Optional[int]):
        super().__init__()
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.scale = query_pre_attn_scalar**-0.5
        self.sliding_window = sliding_window
        self.q_proj = Linear(hidden_size, num_heads * head_dim, use_bias=False)
        self.k_proj = Linear(hidden_size, num_kv_heads * head_dim, use_bias=False)
        self.v_proj = Linear(hidden_size, num_kv_heads * head_dim, use_bias=False)
        self.o_proj = Linear(num_heads * head_dim, hidden_size, use_bias=False)
        self.q_norm = GemmaRMSNorm(head_dim, rms_norm_eps)
        self.k_norm = GemmaRMSNorm(head_dim, rms_norm_eps)

    def __call__(self, params: Params, x: jax.Array, rope, attention_mask) -> jax.Array:
        b, s, _ = x.shape
        q = self.q_proj(params["q_proj"], x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], x).reshape(b, s, self.num_kv_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], x).reshape(b, s, self.num_kv_heads, self.head_dim)
        q = self.q_norm(params["q_norm"], q)
        k = self.k_norm(params["k_norm"], k)
        cos, sin = rope
        q = _apply_halfsplit_rope(q, cos, sin)
        k = _apply_halfsplit_rope(k, cos, sin)
        if self.num_kv_heads != self.num_heads:
            rep = self.num_heads // self.num_kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * self.scale
        qi = jnp.arange(s)[:, None]
        ki = jnp.arange(s)[None, :]
        keep = ki <= qi
        if self.sliding_window is not None:
            keep = keep & ((qi - ki) < self.sliding_window)
        logits = jnp.where(keep[None, None], logits, -2.3819763e38)
        if attention_mask is not None:
            km = attention_mask[:, None, None, :].astype(bool)
            logits = jnp.where(km, logits, -2.3819763e38)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)
        return self.o_proj(params["o_proj"], out)


class Gemma3DecoderLayer(Module):
    def __init__(self, cfg, is_sliding: bool):
        super().__init__()
        self.is_sliding = is_sliding
        self.self_attn = Gemma3Attention(
            cfg["hidden_size"], cfg["num_attention_heads"], cfg["num_key_value_heads"],
            cfg["head_dim"], cfg["query_pre_attn_scalar"], cfg["rms_norm_eps"],
            cfg["sliding_window"] if is_sliding else None,
        )
        self.mlp = GemmaMLP(cfg["hidden_size"], cfg["intermediate_size"])
        self.input_layernorm = GemmaRMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])
        self.post_attention_layernorm = GemmaRMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])
        self.pre_feedforward_layernorm = GemmaRMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])
        self.post_feedforward_layernorm = GemmaRMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])

    def __call__(self, params, x, rope_global, rope_local, attention_mask):
        h = self.input_layernorm(params["input_layernorm"], x)
        h = self.self_attn(params["self_attn"], h,
                           rope_local if self.is_sliding else rope_global, attention_mask)
        h = self.post_attention_layernorm(params["post_attention_layernorm"], h)
        x = x + h
        h = self.pre_feedforward_layernorm(params["pre_feedforward_layernorm"], x)
        h = self.mlp(params["mlp"], h)
        h = self.post_feedforward_layernorm(params["post_feedforward_layernorm"], h)
        return x + h


_GEMMA3_CONFIG_KEYS = (
    "vocab_size", "hidden_size", "intermediate_size", "num_hidden_layers",
    "num_attention_heads", "num_key_value_heads", "head_dim", "rms_norm_eps",
    "rope_theta", "rope_local_base_freq", "query_pre_attn_scalar",
    "sliding_window", "sliding_window_pattern", "layer_types", "rope_scaling",
)


class Gemma3TextModel(Module, ModelMixin, ConfigMixin):
    """transformers-compatible Gemma-3 text trunk: qk-normed GQA, alternating
    sliding/full attention with local/global rope (linear-scaled global)."""

    @register_to_config
    def __init__(
        self,
        vocab_size: int = 262208,
        hidden_size: int = 3840,
        intermediate_size: int = 15360,
        num_hidden_layers: int = 48,
        num_attention_heads: int = 16,
        num_key_value_heads: int = 8,
        head_dim: int = 256,
        rms_norm_eps: float = 1e-6,
        rope_theta: float = 1_000_000.0,
        rope_local_base_freq: float = 10_000.0,
        query_pre_attn_scalar: float = 256,
        sliding_window: int = 1024,
        sliding_window_pattern: int = 6,
        layer_types: Optional[list] = None,
        rope_scaling: Optional[dict] = None,
    ):
        super().__init__()
        if layer_types is None:
            layer_types = [
                "sliding_attention" if (i + 1) % sliding_window_pattern else "full_attention"
                for i in range(num_hidden_layers)
            ]
        cfg = dict(
            hidden_size=hidden_size, intermediate_size=intermediate_size,
            num_attention_heads=num_attention_heads, num_key_value_heads=num_key_value_heads,
            head_dim=head_dim, rms_norm_eps=rms_norm_eps,
            query_pre_attn_scalar=query_pre_attn_scalar, sliding_window=sliding_window,
        )
        self.hidden_size = hidden_size
        self.head_dim = head_dim
        self.rope_theta = rope_theta
        self.rope_local_base_freq = rope_local_base_freq
        self.rope_factor = float((rope_scaling or {}).get("factor", 1.0)) if rope_scaling else 1.0
        self.embed_tokens = Embedding(vocab_size, hidden_size)
        self.layers = ModuleList([
            Gemma3DecoderLayer(cfg, lt == "sliding_attention") for lt in layer_types
        ])
        self.norm = GemmaRMSNorm(hidden_size, rms_norm_eps)

    def __call__(self, params: Params, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 output_hidden_states: bool = False) -> GemmaEncoderOutput:
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        x = x * jnp.asarray(self.hidden_size**0.5, x.dtype)
        positions = jnp.broadcast_to(jnp.arange(input_ids.shape[1]), input_ids.shape)
        rope_global = _rope_tables(positions, self.head_dim, self.rope_theta, self.rope_factor)
        rope_local = _rope_tables(positions, self.head_dim, self.rope_local_base_freq)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(x)
            x = layer(params["layers"][i], x, rope_global, rope_local, attention_mask)
        x = self.norm(params["norm"], x)
        if output_hidden_states:
            all_hidden.append(x)
        return GemmaEncoderOutput(last_hidden_state=x, hidden_states=all_hidden)


class Gemma3ForConditionalGeneration(Module, ModelMixin, ConfigMixin):
    """Text path of transformers' Gemma3ForConditionalGeneration — what LTX-2
    uses as its prompt encoder (per-layer hidden states feed the connectors,
    `/root/reference/src/diffusers/pipelines/ltx2/pipeline_ltx2.py:320`). The
    vision tower is only exercised by image-conditioned prompting; text-only
    checkpoint keys load here and vision/projector keys are skipped."""

    @register_to_config
    def __init__(self, text_config: Optional[dict] = None, **kwargs):
        super().__init__()
        text_config = dict(text_config or {})
        self.language_model = Gemma3TextModel(
            **{k: text_config[k] for k in _GEMMA3_CONFIG_KEYS if k in text_config}
        )

    def __call__(self, params: Params, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 output_hidden_states: bool = False) -> GemmaEncoderOutput:
        return self.language_model(params["language_model"], input_ids,
                                   attention_mask=attention_mask,
                                   output_hidden_states=output_hidden_states)

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, subfolder=None, dtype=None,
                        variant=None, quantization_config=None, **kwargs):
        from safetensors import safe_open

        from ...utils.hub_utils import snapshot_download_repo
        from ...utils.jax_utils import resolve_dtype

        root = str(pretrained_model_name_or_path)
        if not os.path.isdir(root):
            root = snapshot_download_repo(root, **kwargs)
        model_path = os.path.join(root, subfolder) if subfolder else root
        with open(os.path.join(model_path, "config.json")) as f:
            full = json.load(f)
        model = cls(text_config=full.get("text_config", full))

        index_path = os.path.join(model_path, "model.safetensors.index.json")
        if os.path.isfile(index_path):
            with open(index_path) as f:
                files = sorted(set(json.load(f)["weight_map"].values()))
        else:
            files = ["model.safetensors"]
        state = {}
        for fn in files:
            with safe_open(os.path.join(model_path, fn), framework="numpy") as f:
                for k in f.keys():
                    # accept both pre/post-4.52 transformers layouts:
                    # language_model.model.X  /  model.language_model.X  → language_model.X
                    nk = k
                    if nk.startswith("language_model.model."):
                        nk = "language_model." + nk[len("language_model.model."):]
                    elif nk.startswith("model.language_model."):
                        nk = "language_model." + nk[len("model.language_model."):]
                    if nk.startswith(("vision_tower.", "model.vision_tower.",
                                      "multi_modal_projector.", "model.multi_modal_projector.",
                                      "lm_head.", "language_model.lm_head.")):
                        continue
                    state[nk] = f.get_tensor(k)
        params = convert_torch_state_dict(model, state, dtype=resolve_dtype(dtype, default=None))
        from ...quantizers.quantize import maybe_quantize

        params = maybe_quantize(params, quantization_config)
        return model, params

    def save_pretrained(self, save_directory, params, **kwargs):
        from .clip import _save_transformers_style

        _save_transformers_style(self, save_directory, params)


# ---------------------------------------------------------------------------
# T5Gemma encoder (PRX's text encoder)
# ---------------------------------------------------------------------------


class T5GemmaSelfAttention(Module):
    """Bidirectional Gemma-2-style attention with optional sliding window
    (transformers T5GemmaSelfAttention; encoder stack is non-causal)."""

    def __init__(self, hidden_size, num_heads, num_kv_heads, head_dim, query_pre_attn_scalar,
                 attn_logit_softcapping, rope_theta, sliding_window: Optional[int] = None):
        super().__init__()
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.scale = query_pre_attn_scalar**-0.5
        self.softcap = attn_logit_softcapping
        self.rope_theta = rope_theta
        self.sliding_window = sliding_window
        self.q_proj = Linear(hidden_size, num_heads * head_dim, use_bias=False)
        self.k_proj = Linear(hidden_size, num_kv_heads * head_dim, use_bias=False)
        self.v_proj = Linear(hidden_size, num_kv_heads * head_dim, use_bias=False)
        self.o_proj = Linear(num_heads * head_dim, hidden_size, use_bias=False)

    def __call__(self, params: Params, x: jax.Array, positions: jax.Array,
                 attention_mask: Optional[jax.Array]) -> jax.Array:
        b, s, _ = x.shape
        q = self.q_proj(params["q_proj"], x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], x).reshape(b, s, self.num_kv_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], x).reshape(b, s, self.num_kv_heads, self.head_dim)
        q = _rope(q, positions, self.rope_theta)
        k = _rope(k, positions, self.rope_theta)
        if self.num_kv_heads != self.num_heads:
            rep = self.num_heads // self.num_kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * self.scale
        if self.softcap is not None:
            logits = jnp.tanh(logits / self.softcap) * self.softcap
        if self.sliding_window is not None:
            qi = jnp.arange(s)[:, None]
            ki = jnp.arange(s)[None, :]
            keep = jnp.abs(qi - ki) < self.sliding_window
            logits = jnp.where(keep[None, None], logits, -2.3819763e38)
        if attention_mask is not None:
            keep = attention_mask[:, None, None, :].astype(bool)
            logits = jnp.where(keep, logits, -2.3819763e38)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)
        return self.o_proj(params["o_proj"], out)


class T5GemmaEncoderLayer(Module):
    """Sandwich-norm encoder layer (transformers T5GemmaEncoderLayer: the norm
    names differ from Gemma-2's decoder layer)."""

    def __init__(self, cfg, sliding_window: Optional[int]):
        super().__init__()
        self.self_attn = T5GemmaSelfAttention(
            cfg["hidden_size"], cfg["num_attention_heads"], cfg["num_key_value_heads"], cfg["head_dim"],
            cfg["query_pre_attn_scalar"], cfg["attn_logit_softcapping"], cfg["rope_theta"],
            sliding_window=sliding_window,
        )
        self.mlp = GemmaMLP(cfg["hidden_size"], cfg["intermediate_size"])
        self.pre_self_attn_layernorm = GemmaRMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])
        self.post_self_attn_layernorm = GemmaRMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])
        self.pre_feedforward_layernorm = GemmaRMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])
        self.post_feedforward_layernorm = GemmaRMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])

    def __call__(self, params, x, positions, attention_mask):
        h = self.pre_self_attn_layernorm(params["pre_self_attn_layernorm"], x)
        h = self.self_attn(params["self_attn"], h, positions, attention_mask)
        h = self.post_self_attn_layernorm(params["post_self_attn_layernorm"], h)
        x = x + h
        h = self.pre_feedforward_layernorm(params["pre_feedforward_layernorm"], x)
        h = self.mlp(params["mlp"], h)
        h = self.post_feedforward_layernorm(params["post_feedforward_layernorm"], h)
        return x + h


class _T5GemmaEncoderCore(Module):
    def __init__(self, cfg, layer_types):
        super().__init__()
        self.hidden_size = cfg["hidden_size"]
        self.embed_tokens = Embedding(cfg["vocab_size"], cfg["hidden_size"])
        self.layers = ModuleList([
            T5GemmaEncoderLayer(cfg, cfg["sliding_window"] if lt == "sliding_attention" else None)
            for lt in layer_types
        ])
        self.norm = GemmaRMSNorm(cfg["hidden_size"], cfg["rms_norm_eps"])

    def __call__(self, params, input_ids, attention_mask, output_hidden_states):
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        x = x * jnp.asarray(self.hidden_size**0.5, x.dtype)
        positions = jnp.broadcast_to(jnp.arange(input_ids.shape[1]), input_ids.shape)
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(x)
            x = layer(params["layers"][i], x, positions, attention_mask)
        x = self.norm(params["norm"], x)
        if output_hidden_states:
            all_hidden.append(x)
        return x, all_hidden


class T5GemmaEncoderModel(Module, ModelMixin, ConfigMixin):
    """transformers-compatible T5Gemma encoder tower (the PRX prompt encoder,
    reference `/root/reference/src/diffusers/pipelines/prx/pipeline_prx.py:274`).
    Gemma-2 blocks made bidirectional, sliding window on `layer_types`-marked
    layers, checkpoint keys nested under `encoder.`."""

    @register_to_config
    def __init__(
        self,
        vocab_size: int = 256000,
        hidden_size: int = 2304,
        intermediate_size: int = 9216,
        num_hidden_layers: int = 26,
        num_attention_heads: int = 8,
        num_key_value_heads: int = 4,
        head_dim: int = 256,
        rms_norm_eps: float = 1e-6,
        rope_theta: float = 10000.0,
        query_pre_attn_scalar: float = 256,
        attn_logit_softcapping: Optional[float] = 50.0,
        sliding_window: int = 4096,
        layer_types: Optional[Tuple[str, ...]] = None,
    ):
        super().__init__()
        if layer_types is None:  # gemma-2 default: even layers slide
            layer_types = tuple(
                "sliding_attention" if i % 2 == 0 else "full_attention"
                for i in range(num_hidden_layers)
            )
        cfg = dict(
            vocab_size=vocab_size, hidden_size=hidden_size, intermediate_size=intermediate_size,
            num_attention_heads=num_attention_heads, num_key_value_heads=num_key_value_heads,
            head_dim=head_dim, rms_norm_eps=rms_norm_eps, rope_theta=rope_theta,
            query_pre_attn_scalar=query_pre_attn_scalar, attn_logit_softcapping=attn_logit_softcapping,
            sliding_window=sliding_window,
        )
        self.encoder = _T5GemmaEncoderCore(cfg, layer_types)

    def __call__(self, params: Params, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 output_hidden_states: bool = False) -> GemmaEncoderOutput:
        x, all_hidden = self.encoder(params["encoder"], input_ids, attention_mask, output_hidden_states)
        return GemmaEncoderOutput(last_hidden_state=x, hidden_states=all_hidden)

    def __getitem__(self, key):  # dict-style access (reference uses ["last_hidden_state"])
        raise TypeError("call the model first")

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, subfolder=None, dtype=None, variant=None,
                        quantization_config=None, **kwargs):
        from safetensors import safe_open

        from ...utils.hub_utils import snapshot_download_repo
        from ...utils.jax_utils import resolve_dtype

        root = str(pretrained_model_name_or_path)
        if not os.path.isdir(root):
            root = snapshot_download_repo(root, **kwargs)
        model_path = os.path.join(root, subfolder) if subfolder else root
        with open(os.path.join(model_path, "config.json")) as f:
            full = json.load(f)
        enc = full.get("encoder", full)
        keys = _GEMMA_CONFIG_KEYS + ("layer_types",)
        model = cls(**{k: enc[k] for k in keys if k in enc})

        index_path = os.path.join(model_path, "model.safetensors.index.json")
        if os.path.isfile(index_path):
            with open(index_path) as f:
                files = sorted(set(json.load(f)["weight_map"].values()))
        else:
            files = ["model.safetensors"]
        state = {}
        for fn in files:
            with safe_open(os.path.join(model_path, fn), framework="numpy") as f:
                for k in f.keys():
                    key = k.removeprefix("model.")
                    if key.startswith("decoder.") or key.startswith("lm_head"):
                        continue  # encoder-only tower
                    state[key] = f.get_tensor(k)
        params = convert_torch_state_dict(model, state, dtype=resolve_dtype(dtype, default=None))
        from ...quantizers.quantize import maybe_quantize

        params = maybe_quantize(params, quantization_config)
        return model, params

    def save_pretrained(self, save_directory, params, **kwargs):
        from .clip import _save_transformers_style

        _save_transformers_style(self, save_directory, params)
