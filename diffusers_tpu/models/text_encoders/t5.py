"""T5 text encoder — JAX-native implementation loading transformers
checkpoints (`T5EncoderModel`, used by SD3/Flux/Wan for long-prompt
conditioning). Parameter names match the transformers state dict
(``encoder.block.N.layer.0.SelfAttention.q`` …).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Embedding, Linear, Module, ModuleList, Params, RMSNorm
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin, convert_torch_state_dict


@dataclass
class T5EncoderOutput(BaseOutput):
    last_hidden_state: jax.Array


def _relative_position_bucket(relative_position, bidirectional=True, num_buckets=32, max_distance=128):
    """transformers T5Attention._relative_position_bucket semantics."""
    relative_buckets = 0
    if bidirectional:
        num_buckets //= 2
        relative_buckets += (relative_position > 0).astype(jnp.int32) * num_buckets
        relative_position = jnp.abs(relative_position)
    else:
        relative_position = -jnp.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = relative_position < max_exact
    relative_position_if_large = max_exact + (
        jnp.log(relative_position.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    relative_position_if_large = jnp.minimum(relative_position_if_large, num_buckets - 1)
    relative_buckets += jnp.where(is_small, relative_position, relative_position_if_large)
    return relative_buckets


class T5Attention(Module):
    def __init__(self, d_model: int, d_kv: int, num_heads: int, has_relative_bias: bool,
                 relative_attention_num_buckets: int = 32, relative_attention_max_distance: int = 128):
        super().__init__()
        self.num_heads = num_heads
        self.d_kv = d_kv
        inner = num_heads * d_kv
        self.q = Linear(d_model, inner, use_bias=False)
        self.k = Linear(d_model, inner, use_bias=False)
        self.v = Linear(d_model, inner, use_bias=False)
        self.o = Linear(inner, d_model, use_bias=False)
        self.has_relative_bias = has_relative_bias
        self.relative_attention_num_buckets = relative_attention_num_buckets
        self.relative_attention_max_distance = relative_attention_max_distance
        if has_relative_bias:
            self.relative_attention_bias = Embedding(relative_attention_num_buckets, num_heads)

    def compute_bias(self, params: Params, seq_len: int) -> jax.Array:
        ctx = jnp.arange(seq_len)[:, None]
        mem = jnp.arange(seq_len)[None, :]
        buckets = _relative_position_bucket(
            mem - ctx,
            bidirectional=True,
            num_buckets=self.relative_attention_num_buckets,
            max_distance=self.relative_attention_max_distance,
        )
        bias = self.relative_attention_bias(params["relative_attention_bias"], buckets)  # [S,S,H]
        return jnp.transpose(bias, (2, 0, 1))[None]  # [1,H,S,S]

    def __call__(self, params: Params, x: jax.Array, position_bias: Optional[jax.Array]) -> jax.Array:
        b, s, _ = x.shape
        q = self.q(params["q"], x).reshape(b, s, self.num_heads, self.d_kv)
        k = self.k(params["k"], x).reshape(b, s, self.num_heads, self.d_kv)
        v = self.v(params["v"], x).reshape(b, s, self.num_heads, self.d_kv)
        # T5: no 1/sqrt(d) scaling; additive relative-position bias
        out = dispatch_attention_fn(q, k, v, attn_mask=position_bias, scale=1.0, backend="native")
        out = out.reshape(b, s, self.num_heads * self.d_kv)
        return self.o(params["o"], out)


class T5DenseGatedActDense(Module):
    def __init__(self, d_model: int, d_ff: int):
        super().__init__()
        self.wi_0 = Linear(d_model, d_ff, use_bias=False)
        self.wi_1 = Linear(d_model, d_ff, use_bias=False)
        self.wo = Linear(d_ff, d_model, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        gelu = jax.nn.gelu(self.wi_0(params["wi_0"], x), approximate=True)
        linear = self.wi_1(params["wi_1"], x)
        return self.wo(params["wo"], gelu * linear)


class T5DenseActDense(Module):
    def __init__(self, d_model: int, d_ff: int):
        super().__init__()
        self.wi = Linear(d_model, d_ff, use_bias=False)
        self.wo = Linear(d_ff, d_model, use_bias=False)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.wo(params["wo"], jax.nn.relu(self.wi(params["wi"], x)))


class _SelfAttnLayer(Module):
    def __init__(self, cfg, has_relative_bias):
        super().__init__()
        self.SelfAttention = T5Attention(
            cfg["d_model"], cfg["d_kv"], cfg["num_heads"], has_relative_bias,
            cfg.get("relative_attention_num_buckets", 32), cfg.get("relative_attention_max_distance", 128),
        )
        self.layer_norm = RMSNorm(cfg["d_model"], eps=cfg.get("layer_norm_epsilon", 1e-6))

    def __call__(self, params, x, position_bias):
        normed = self.layer_norm(params["layer_norm"], x)
        return x + self.SelfAttention(params["SelfAttention"], normed, position_bias)


class _FFLayer(Module):
    def __init__(self, cfg):
        super().__init__()
        gated = "gated" in cfg.get("feed_forward_proj", "relu") or cfg.get("is_gated_act", False)
        self.DenseReluDense = (
            T5DenseGatedActDense(cfg["d_model"], cfg["d_ff"]) if gated else T5DenseActDense(cfg["d_model"], cfg["d_ff"])
        )
        self.layer_norm = RMSNorm(cfg["d_model"], eps=cfg.get("layer_norm_epsilon", 1e-6))

    def __call__(self, params, x):
        normed = self.layer_norm(params["layer_norm"], x)
        return x + self.DenseReluDense(params["DenseReluDense"], normed)


class T5Block(Module):
    def __init__(self, cfg, has_relative_bias):
        super().__init__()
        self.layer = ModuleList([_SelfAttnLayer(cfg, has_relative_bias), _FFLayer(cfg)])

    def __call__(self, params, x, position_bias):
        x = self.layer[0](params["layer"][0], x, position_bias)
        x = self.layer[1](params["layer"][1], x)
        return x


class T5Stack(Module):
    def __init__(self, cfg, per_layer_relative_bias: bool = False):
        super().__init__()
        self.cfg = cfg
        self.per_layer_relative_bias = per_layer_relative_bias
        self.block = ModuleList(
            [T5Block(cfg, has_relative_bias=(per_layer_relative_bias or i == 0)) for i in range(cfg["num_layers"])]
        )
        self.final_layer_norm = RMSNorm(cfg["d_model"], eps=cfg.get("layer_norm_epsilon", 1e-6))

    def __call__(self, params, hidden, attention_mask=None):
        s = hidden.shape[1]
        mask = None
        if attention_mask is not None:
            # [B,S] -> additive [B,1,1,S]
            mask = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * jnp.finfo(jnp.float32).min
        if self.per_layer_relative_bias:
            # UMT5: each layer computes its own relative bias
            for i, block in enumerate(self.block):
                bias = block.layer[0].SelfAttention.compute_bias(
                    params["block"][i]["layer"][0]["SelfAttention"], s
                )
                hidden = block(params["block"][i], hidden, bias if mask is None else bias + mask)
            return self.final_layer_norm(params["final_layer_norm"], hidden)
        position_bias = self.block[0].layer[0].SelfAttention.compute_bias(
            params["block"][0]["layer"][0]["SelfAttention"], s
        )
        if mask is not None:
            position_bias = position_bias + mask
        for i, block in enumerate(self.block):
            hidden = block(params["block"][i], hidden, position_bias)
        return self.final_layer_norm(params["final_layer_norm"], hidden)


_T5_CONFIG_KEYS = [
    "vocab_size", "d_model", "d_kv", "d_ff", "num_layers", "num_heads",
    "relative_attention_num_buckets", "relative_attention_max_distance",
    "layer_norm_epsilon", "feed_forward_proj",
]


class T5EncoderModel(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        vocab_size: int = 32128,
        d_model: int = 512,
        d_kv: int = 64,
        d_ff: int = 2048,
        num_layers: int = 6,
        num_heads: int = 8,
        relative_attention_num_buckets: int = 32,
        relative_attention_max_distance: int = 128,
        layer_norm_epsilon: float = 1e-6,
        feed_forward_proj: str = "relu",
        **kwargs,
    ):
        super().__init__()
        cfg = dict(
            vocab_size=vocab_size, d_model=d_model, d_kv=d_kv, d_ff=d_ff, num_layers=num_layers,
            num_heads=num_heads, relative_attention_num_buckets=relative_attention_num_buckets,
            relative_attention_max_distance=relative_attention_max_distance,
            layer_norm_epsilon=layer_norm_epsilon, feed_forward_proj=feed_forward_proj,
        )
        self.shared = Embedding(vocab_size, d_model)
        self.encoder = T5Stack(cfg)

    def __call__(self, params: Params, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None) -> T5EncoderOutput:
        hidden = self.shared(params["shared"], input_ids)
        last_hidden = self.encoder(params["encoder"], hidden, attention_mask)
        return T5EncoderOutput(last_hidden_state=last_hidden)

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, subfolder=None, dtype=None, variant=None, quantization_config=None, **kwargs):
        from ...utils.hub_utils import snapshot_download_repo
        from ...utils.jax_utils import resolve_dtype
        from safetensors import safe_open

        root = str(pretrained_model_name_or_path)
        if not os.path.isdir(root):
            root = snapshot_download_repo(root, **kwargs)
        model_path = os.path.join(root, subfolder) if subfolder else root

        with open(os.path.join(model_path, "config.json")) as f:
            full_config = json.load(f)
        init_kwargs = {k: full_config[k] for k in _T5_CONFIG_KEYS if k in full_config}
        model = cls(**init_kwargs)

        index_path = os.path.join(model_path, "model.safetensors.index.json")
        files = []
        if os.path.isfile(index_path):
            with open(index_path) as f:
                files = sorted(set(json.load(f)["weight_map"].values()))
        else:
            name = "model.safetensors" if variant is None else f"model.{variant}.safetensors"
            files = [name]
        state = {}
        for fn in files:
            with safe_open(os.path.join(model_path, fn), framework="numpy") as f:
                for k in f.keys():
                    state[k] = f.get_tensor(k)
        # encoder-only: drop decoder weights if a full T5 checkpoint is given
        state = {k: v for k, v in state.items() if k.startswith(("shared", "encoder"))}
        # some checkpoints alias shared as encoder.embed_tokens
        state.pop("encoder.embed_tokens.weight", None)
        params = convert_torch_state_dict(model, state, dtype=resolve_dtype(dtype, default=None))
        from ...quantizers.quantize import maybe_quantize

        params = maybe_quantize(params, quantization_config)
        return model, params

    def save_pretrained(self, save_directory, params, **kwargs):
        """transformers layout: model.safetensors (+ config.json), so our own
        from_pretrained round-trips."""
        from .clip import _save_transformers_style

        _save_transformers_style(self, save_directory, params)


class UMT5EncoderModel(T5EncoderModel):
    """UMT5 variant: every layer owns its relative attention bias (used by
    AuraFlow's pile-t5 and Wan's umt5-xxl; transformers UMT5EncoderModel)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        cfg = self.encoder.cfg
        self.encoder = T5Stack(cfg, per_layer_relative_bias=True)
