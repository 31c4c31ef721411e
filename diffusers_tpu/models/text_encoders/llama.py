"""LLaMA text encoder (HunyuanVideo's prompt encoder) — native JAX.

Checkpoint-compatible with transformers' `LlamaModel` state dict (the
reference HunyuanVideo pipeline crosses into transformers at
`/root/reference/src/diffusers/pipelines/hunyuan_video/pipeline_hunyuan_video.py:249`,
taking `hidden_states[-(skip+1)]` from a llava-llama-3-8b trunk).

Standard LLaMA: plain RMSNorm (w·x̂), half-split RoPE (theta 500k for llama-3),
GQA, SiLU-gated MLP, pre-norm residual blocks. Returns all hidden states so
pipelines can pick intermediate layers.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Embedding, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin, convert_torch_state_dict
from .gemma import _rope


@dataclass
class LlamaEncoderOutput(BaseOutput):
    last_hidden_state: jax.Array
    hidden_states: Optional[Tuple[jax.Array, ...]] = None


class LlamaRMSNorm(Module):
    def __init__(self, dim: int, eps: float = 1e-5):
        super().__init__()
        self.dim = dim
        self.eps = eps

    def init(self, key, dtype=jnp.float32) -> Params:
        return {"weight": jnp.ones((self.dim,), dtype)}

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps)
        return (xf * params["weight"].astype(jnp.float32)).astype(dtype)


class LlamaAttention(Module):
    def __init__(self, hidden_size, num_heads, num_kv_heads, head_dim, rope_theta,
                 attention_bias: bool = False, qk_norm: bool = False, rms_norm_eps: float = 1e-6):
        super().__init__()
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.scale = head_dim**-0.5
        self.rope_theta = rope_theta
        # Qwen2/Qwen2.5(-VL) towers are Llama with qkv bias (o_proj stays bias-free)
        self.q_proj = Linear(hidden_size, num_heads * head_dim, use_bias=attention_bias)
        self.k_proj = Linear(hidden_size, num_kv_heads * head_dim, use_bias=attention_bias)
        self.v_proj = Linear(hidden_size, num_kv_heads * head_dim, use_bias=attention_bias)
        self.o_proj = Linear(num_heads * head_dim, hidden_size, use_bias=False)
        # Qwen3 towers add per-head q/k RMSNorm before rope
        self.q_norm = LlamaRMSNorm(head_dim, rms_norm_eps) if qk_norm else None
        self.k_norm = LlamaRMSNorm(head_dim, rms_norm_eps) if qk_norm else None

    def __call__(self, params: Params, x: jax.Array, positions: jax.Array,
                 attention_mask: Optional[jax.Array]) -> jax.Array:
        b, s, _ = x.shape
        q = self.q_proj(params["q_proj"], x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], x).reshape(b, s, self.num_kv_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], x).reshape(b, s, self.num_kv_heads, self.head_dim)
        if self.q_norm is not None:
            q = self.q_norm(params["q_norm"], q)
            k = self.k_norm(params["k_norm"], k)
        q = _rope(q, positions, self.rope_theta)
        k = _rope(k, positions, self.rope_theta)
        if self.num_kv_heads != self.num_heads:
            rep = self.num_heads // self.num_kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * self.scale
        causal = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(causal[None, None], logits, jnp.finfo(jnp.float32).min)
        if attention_mask is not None:
            keep = attention_mask[:, None, None, :].astype(bool)
            logits = jnp.where(keep, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)
        return self.o_proj(params["o_proj"], out)


class LlamaMLP(Module):
    def __init__(self, hidden_size, intermediate_size):
        super().__init__()
        self.gate_proj = Linear(hidden_size, intermediate_size, use_bias=False)
        self.up_proj = Linear(hidden_size, intermediate_size, use_bias=False)
        self.down_proj = Linear(intermediate_size, hidden_size, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.down_proj(
            params["down_proj"],
            jax.nn.silu(self.gate_proj(params["gate_proj"], x)) * self.up_proj(params["up_proj"], x),
        )


class LlamaDecoderLayer(Module):
    def __init__(self, hidden_size, intermediate_size, num_heads, num_kv_heads, head_dim,
                 rms_norm_eps, rope_theta, attention_bias: bool = False, qk_norm: bool = False):
        super().__init__()
        self.self_attn = LlamaAttention(hidden_size, num_heads, num_kv_heads, head_dim, rope_theta,
                                        attention_bias=attention_bias, qk_norm=qk_norm,
                                        rms_norm_eps=rms_norm_eps)
        self.mlp = LlamaMLP(hidden_size, intermediate_size)
        self.input_layernorm = LlamaRMSNorm(hidden_size, rms_norm_eps)
        self.post_attention_layernorm = LlamaRMSNorm(hidden_size, rms_norm_eps)

    def __call__(self, params, x, positions, attention_mask):
        x = x + self.self_attn(params["self_attn"], self.input_layernorm(params["input_layernorm"], x),
                               positions, attention_mask)
        x = x + self.mlp(params["mlp"], self.post_attention_layernorm(params["post_attention_layernorm"], x))
        return x


_LLAMA_CONFIG_KEYS = (
    "vocab_size", "hidden_size", "intermediate_size", "num_hidden_layers", "num_attention_heads",
    "num_key_value_heads", "head_dim", "rms_norm_eps", "rope_theta",
)


class LlamaModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        vocab_size: int = 128320,
        hidden_size: int = 4096,
        intermediate_size: int = 14336,
        num_hidden_layers: int = 32,
        num_attention_heads: int = 32,
        num_key_value_heads: int = 8,
        head_dim: Optional[int] = None,
        rms_norm_eps: float = 1e-5,
        rope_theta: float = 500000.0,
        attention_bias: bool = False,
        qk_norm: bool = False,
    ):
        super().__init__()
        head_dim = head_dim or hidden_size // num_attention_heads
        self.embed_tokens = Embedding(vocab_size, hidden_size)
        self.layers = ModuleList(
            [
                LlamaDecoderLayer(hidden_size, intermediate_size, num_attention_heads,
                                  num_key_value_heads, head_dim, rms_norm_eps, rope_theta,
                                  attention_bias=attention_bias, qk_norm=qk_norm)
                for _ in range(num_hidden_layers)
            ]
        )
        self.norm = LlamaRMSNorm(hidden_size, rms_norm_eps)

    def __call__(self, params: Params, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None,
                 position_ids: Optional[jax.Array] = None,
                 output_hidden_states: bool = False,
                 normalize_last_hidden_state: bool = True) -> LlamaEncoderOutput:
        x = self.embed_tokens(params["embed_tokens"], input_ids)
        if position_ids is not None:
            positions = position_ids
        else:
            positions = jnp.broadcast_to(jnp.arange(input_ids.shape[1]), input_ids.shape)
        hidden_states = [x] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][i], x, positions, attention_mask)
            if output_hidden_states:
                hidden_states.append(x)
        x = self.norm(params["norm"], x)
        if output_hidden_states and normalize_last_hidden_state:
            hidden_states[-1] = x  # transformers replaces the last entry with the normed output
        return LlamaEncoderOutput(
            last_hidden_state=x,
            hidden_states=tuple(hidden_states) if output_hidden_states else None,
        )

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
        if "text_config" in full:  # llava wrapper configs
            full = full["text_config"]
        extra = {}
        # Qwen3 towers: per-head q/k RMSNorm (transformers Qwen3Attention);
        # Qwen2 towers: qkv projection bias
        if full.get("model_type") in ("qwen3", "qwen3_moe", "qwen3_vl", "qwen3_vl_moe", "qwen3_vl_text"):
            extra["qk_norm"] = True
        if full.get("model_type", "").startswith("qwen2") or full.get("attention_bias"):
            extra["attention_bias"] = True
        model = cls(**{k: full[k] for k in _LLAMA_CONFIG_KEYS if k in full}, **extra)

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
                    # multimodal wrappers (llava / Mistral3) carry a vision
                    # tower + projector the text trunk doesn't need; newer
                    # transformers nests the trunk at model.language_model.*
                    if any(seg in k.split(".")[:3] for seg in ("vision_tower", "visual", "multi_modal_projector")):
                        continue
                    # nesting varies by transformers version: model.*,
                    # model.language_model.*, or language_model.model.*
                    key = k
                    while key.startswith(("model.", "language_model.")):
                        key = key.removeprefix("model.").removeprefix("language_model.")
                    state[key] = f.get_tensor(k)
        state.pop("lm_head.weight", None)
        params = convert_torch_state_dict(model, state, dtype=resolve_dtype(dtype, default=None))
        from ...quantizers.quantize import maybe_quantize

        params = maybe_quantize(params, quantization_config)
        return model, params

    def save_pretrained(self, save_directory, params, **kwargs):
        from .clip import _save_transformers_style

        _save_transformers_style(self, save_directory, params)
