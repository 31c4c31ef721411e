"""XLM-Roberta text tower + MultilingualCLIP head (Kandinsky 2.1's prompt
encoder).

Checkpoint-compatible with the reference wrapper
(`/root/reference/src/diffusers/pipelines/kandinsky/text_encoder.py:14`
MultilingualCLIP = transformers XLMRobertaModel + masked-mean + Linear).
BERT-style post-LN encoder: learned positions offset by the padding index
(transformers `create_position_ids_from_input_ids`), token-type embeddings,
post-attention/post-FFN residual LayerNorms, GELU intermediate.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Embedding, LayerNorm, Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin, convert_torch_state_dict


@dataclass
class MCLIPOutput(BaseOutput):
    projected: jax.Array  # [B, numDims] masked-mean pooled projection
    last_hidden_state: jax.Array  # [B, S, hidden]


class _BertSelfAttention(Module):
    def __init__(self, hidden_size: int, num_heads: int):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = hidden_size // num_heads
        self.query = Linear(hidden_size, hidden_size)
        self.key = Linear(hidden_size, hidden_size)
        self.value = Linear(hidden_size, hidden_size)

    def __call__(self, params: Params, x: jax.Array, attention_mask: Optional[jax.Array]) -> jax.Array:
        b, s, _ = x.shape
        q = self.query(params["query"], x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], x).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], x).reshape(b, s, self.num_heads, self.head_dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits * (self.head_dim**-0.5)
        if attention_mask is not None:
            keep = attention_mask[:, None, None, :].astype(bool)
            logits = jnp.where(keep, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, -1)


class _BertAttention(Module):
    def __init__(self, hidden_size: int, num_heads: int, eps: float):
        super().__init__()
        # transformers nesting: attention.self.* / attention.output.*
        self.self = _BertSelfAttention(hidden_size, num_heads)
        self.output = _BertSelfOutput(hidden_size, eps)

    def __call__(self, params, x, attention_mask):
        attn = self.self(params["self"], x, attention_mask)
        return self.output(params["output"], attn, x)


class _BertSelfOutput(Module):
    def __init__(self, hidden_size: int, eps: float):
        super().__init__()
        self.dense = Linear(hidden_size, hidden_size)
        self.LayerNorm = LayerNorm(hidden_size, eps=eps)

    def __call__(self, params, x, residual):
        return self.LayerNorm(params["LayerNorm"], self.dense(params["dense"], x) + residual)


class _BertIntermediate(Module):
    def __init__(self, hidden_size: int, intermediate_size: int):
        super().__init__()
        self.dense = Linear(hidden_size, intermediate_size)

    def __call__(self, params, x):
        return jax.nn.gelu(self.dense(params["dense"], x), approximate=False)


class _BertOutput(Module):
    def __init__(self, hidden_size: int, intermediate_size: int, eps: float):
        super().__init__()
        self.dense = Linear(intermediate_size, hidden_size)
        self.LayerNorm = LayerNorm(hidden_size, eps=eps)

    def __call__(self, params, x, residual):
        return self.LayerNorm(params["LayerNorm"], self.dense(params["dense"], x) + residual)


class _BertLayer(Module):
    def __init__(self, hidden_size: int, num_heads: int, intermediate_size: int, eps: float):
        super().__init__()
        self.attention = _BertAttention(hidden_size, num_heads, eps)
        self.intermediate = _BertIntermediate(hidden_size, intermediate_size)
        self.output = _BertOutput(hidden_size, intermediate_size, eps)

    def __call__(self, params, x, attention_mask):
        x = self.attention(params["attention"], x, attention_mask)
        h = self.intermediate(params["intermediate"], x)
        return self.output(params["output"], h, x)


class _RobertaEmbeddings(Module):
    def __init__(self, vocab_size, hidden_size, max_position_embeddings, type_vocab_size,
                 pad_token_id, eps):
        super().__init__()
        self.pad_token_id = pad_token_id
        self.word_embeddings = Embedding(vocab_size, hidden_size)
        self.position_embeddings = Embedding(max_position_embeddings, hidden_size)
        self.token_type_embeddings = Embedding(type_vocab_size, hidden_size)
        self.LayerNorm = LayerNorm(hidden_size, eps=eps)

    def __call__(self, params, input_ids):
        mask = (input_ids != self.pad_token_id).astype(jnp.int32)
        # transformers create_position_ids_from_input_ids: pad-aware cumsum
        position_ids = jnp.cumsum(mask, axis=1) * mask + self.pad_token_id
        x = self.word_embeddings(params["word_embeddings"], input_ids)
        x = x + self.position_embeddings(params["position_embeddings"], position_ids)
        x = x + self.token_type_embeddings(params["token_type_embeddings"], jnp.zeros_like(input_ids))
        return self.LayerNorm(params["LayerNorm"], x)


class _XLMRobertaEncoder(Module):
    def __init__(self, cfg):
        super().__init__()
        self.layer = ModuleList([
            _BertLayer(cfg["hidden_size"], cfg["num_attention_heads"], cfg["intermediate_size"],
                       cfg["layer_norm_eps"])
            for _ in range(cfg["num_hidden_layers"])
        ])

    def __call__(self, params, x, attention_mask, output_hidden_states: bool = False):
        hidden_states = [x]
        for i, layer in enumerate(self.layer):
            x = layer(params["layer"][i], x, attention_mask)
            hidden_states.append(x)
        if output_hidden_states:
            return x, hidden_states
        return x


class _XLMRobertaModel(Module):
    """transformers XLMRobertaModel (pooler excluded — MCLIP pools by mask)."""

    def __init__(self, cfg):
        super().__init__()
        self.embeddings = _RobertaEmbeddings(
            cfg["vocab_size"], cfg["hidden_size"], cfg["max_position_embeddings"],
            cfg["type_vocab_size"], cfg["pad_token_id"], cfg["layer_norm_eps"])
        self.encoder = _XLMRobertaEncoder(cfg)

    def __call__(self, params, input_ids, attention_mask, output_hidden_states: bool = False):
        x = self.embeddings(params["embeddings"], input_ids)
        return self.encoder(params["encoder"], x, attention_mask,
                            output_hidden_states=output_hidden_states)


class MultilingualCLIP(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        vocab_size: int = 250002,
        hidden_size: int = 1024,
        intermediate_size: int = 4096,
        num_hidden_layers: int = 24,
        num_attention_heads: int = 16,
        max_position_embeddings: int = 514,
        type_vocab_size: int = 1,
        pad_token_id: int = 1,
        layer_norm_eps: float = 1e-5,
        transformerDimensions: int = 1024,
        numDims: int = 768,
    ):
        super().__init__()
        cfg = dict(
            vocab_size=vocab_size, hidden_size=hidden_size, intermediate_size=intermediate_size,
            num_hidden_layers=num_hidden_layers, num_attention_heads=num_attention_heads,
            max_position_embeddings=max_position_embeddings, type_vocab_size=type_vocab_size,
            pad_token_id=pad_token_id, layer_norm_eps=layer_norm_eps,
        )
        self.transformer = _XLMRobertaModel(cfg)
        self.LinearTransformation = Linear(transformerDimensions, numDims)

    def __call__(self, params: Params, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None) -> MCLIPOutput:
        if attention_mask is None:
            attention_mask = (input_ids != self.config.pad_token_id).astype(jnp.int32)
        embs = self.transformer(params["transformer"], input_ids, attention_mask)
        m = attention_mask.astype(embs.dtype)[..., None]
        pooled = (embs * m).sum(axis=1) / m.sum(axis=1)
        return MCLIPOutput(
            projected=self.LinearTransformation(params["LinearTransformation"], pooled),
            last_hidden_state=embs,
        )

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
        keys = ("vocab_size", "hidden_size", "intermediate_size", "num_hidden_layers",
                "num_attention_heads", "max_position_embeddings", "type_vocab_size",
                "pad_token_id", "layer_norm_eps", "transformerDimensions", "numDims")
        model = cls(**{k: full[k] for k in keys if k in full})

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
                    if "pooler" in k or "position_ids" in k:
                        continue
                    state[k] = f.get_tensor(k)
        params = convert_torch_state_dict(model, state, dtype=resolve_dtype(dtype, default=None))
        return model, params

    def save_pretrained(self, save_directory, params, **kwargs):
        from .clip import _save_transformers_style

        _save_transformers_style(self, save_directory, params)
