"""Minimal GPT-2 model over input embeddings.

Matches the transformers `GPT2Model` checkpoint layout (wte/wpe,
h.N.{ln_1, attn.c_attn/c_proj, ln_2, mlp.c_fc/c_proj}, ln_f). GPT-2 uses
`Conv1D` layers whose weights are stored [in, out] (already transposed
relative to nn.Linear) — `GPT2Conv1D.convert_torch_param` keeps them as-is.

Used by AudioLDM2's `generate_language_model`, which autoregressively
appends the LAST HIDDEN STATE (not a sampled token) as the next input
embedding; with full-sequence recomputation the arange positions match the
reference's incremental KV-cached generation exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Embedding, LayerNorm, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin


@dataclass
class GPT2Output(BaseOutput):
    last_hidden_state: jax.Array


class GPT2Conv1D(Module):
    """GPT-2 Conv1D: y = x @ W + b with W stored [in, out]."""

    def __init__(self, in_features: int, out_features: int):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return {
            "weight": jax.random.normal(key, (self.in_features, self.out_features), jnp.float32) * 0.02,
            "bias": jnp.zeros((self.out_features,), jnp.float32),
        }

    def convert_torch_param(self, pname: str, tensor: np.ndarray):
        return pname, tensor  # Conv1D weight is already [in, out]

    def convert_param_to_torch(self, pname: str, array: np.ndarray):
        return pname, array

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return x @ params["weight"] + params["bias"]


class _GPT2Attention(Module):
    def __init__(self, hidden_size: int, num_heads: int):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = hidden_size // num_heads
        self.c_attn = GPT2Conv1D(hidden_size, 3 * hidden_size)
        self.c_proj = GPT2Conv1D(hidden_size, hidden_size)

    def __call__(self, params: Params, x: jax.Array, attention_mask=None) -> jax.Array:
        b, s, d = x.shape
        qkv = self.c_attn(params["c_attn"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, s, self.num_heads, self.head_dim)
        v = v.reshape(b, s, self.num_heads, self.head_dim)
        keep = jnp.tril(jnp.ones((s, s), bool))[None, None]
        if attention_mask is not None:
            keep = keep & attention_mask[:, None, None, :].astype(bool)
        out = dispatch_attention_fn(q, k, v, attn_mask=keep)
        return self.c_proj(params["c_proj"], out.reshape(b, s, d))


class _GPT2MLP(Module):
    def __init__(self, hidden_size: int, inner: int):
        super().__init__()
        self.c_fc = GPT2Conv1D(hidden_size, inner)
        self.c_proj = GPT2Conv1D(inner, hidden_size)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.c_proj(params["c_proj"], jax.nn.gelu(self.c_fc(params["c_fc"], x), approximate=True))


class _GPT2Block(Module):
    def __init__(self, hidden_size: int, num_heads: int, inner: int, eps: float):
        super().__init__()
        self.ln_1 = LayerNorm(hidden_size, eps=eps)
        self.attn = _GPT2Attention(hidden_size, num_heads)
        self.ln_2 = LayerNorm(hidden_size, eps=eps)
        self.mlp = _GPT2MLP(hidden_size, inner)

    def __call__(self, params, x, attention_mask=None):
        x = x + self.attn(params["attn"], self.ln_1(params["ln_1"], x), attention_mask)
        x = x + self.mlp(params["mlp"], self.ln_2(params["ln_2"], x))
        return x


class GPT2Model(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        vocab_size: int = 50257,
        n_positions: int = 1024,
        n_embd: int = 768,
        n_layer: int = 12,
        n_head: int = 12,
        n_inner: Optional[int] = None,
        layer_norm_epsilon: float = 1e-5,
        max_new_tokens: int = 8,
        **unused,
    ):
        super().__init__()
        inner = n_inner if n_inner is not None else 4 * n_embd
        self.wte = Embedding(vocab_size, n_embd)
        self.wpe = Embedding(n_positions, n_embd)
        self.h = ModuleList([_GPT2Block(n_embd, n_head, inner, layer_norm_epsilon)
                             for _ in range(n_layer)])
        self.ln_f = LayerNorm(n_embd, eps=layer_norm_epsilon)

    def __call__(self, params: Params, input_ids: Optional[jax.Array] = None,
                 inputs_embeds: Optional[jax.Array] = None,
                 attention_mask: Optional[jax.Array] = None) -> GPT2Output:
        if inputs_embeds is None:
            inputs_embeds = self.wte(params["wte"], input_ids)
        s = inputs_embeds.shape[1]
        pos = self.wpe(params["wpe"], jnp.arange(s))
        x = inputs_embeds + pos[None]
        for i, block in enumerate(self.h):
            x = block(params["h"][i], x, attention_mask)
        x = self.ln_f(params["ln_f"], x)
        return GPT2Output(last_hidden_state=x)

    # transformers layout: model.safetensors + config.json
    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, subfolder=None, dtype=None,
                        variant=None, quantization_config=None, **kwargs):
        import json
        import os

        from safetensors import safe_open

        from ...utils.hub_utils import snapshot_download_repo
        from ...utils.jax_utils import resolve_dtype

        root = str(pretrained_model_name_or_path)
        if not os.path.isdir(root):
            root = snapshot_download_repo(root, **kwargs)
        model_path = os.path.join(root, subfolder) if subfolder else root
        with open(os.path.join(model_path, "config.json")) as f:
            full_config = json.load(f)
        model = cls(**{k: v for k, v in full_config.items() if not k.startswith("_")})

        weights_file = "model.safetensors" if variant is None else f"model.{variant}.safetensors"
        state = {}
        with safe_open(os.path.join(model_path, weights_file), framework="numpy") as f:
            for k in f.keys():
                kk = k[len("transformer."):] if k.startswith("transformer.") else k
                if kk.endswith((".attn.bias", ".attn.masked_bias")) or kk == "lm_head.weight":
                    continue  # causal-mask buffers / tied LM head
                state[kk] = f.get_tensor(k)
        from ..modeling_utils import convert_torch_state_dict

        params = convert_torch_state_dict(model, state, dtype=resolve_dtype(dtype, default=None))
        from ...quantizers.quantize import maybe_quantize

        return model, maybe_quantize(params, quantization_config)

    def save_pretrained(self, save_directory, params, **kwargs):
        from .clip import _save_transformers_style

        _save_transformers_style(self, save_directory, params)
