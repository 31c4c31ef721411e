"""Qwen2.5-VL text tower — the Qwen-Image prompt encoder, native JAX.

Checkpoint-compatible with transformers' `Qwen2_5_VLForConditionalGeneration`
language model (the reference QwenImage pipeline crosses into transformers at
`/root/reference/src/diffusers/pipelines/qwenimage/pipeline_qwenimage.py:157,204`,
taking `hidden_states[-1]` after a chat-template prefix is dropped).

The language tower is Llama with qkv bias (o_proj bias-free), rope_theta 1e6.
Qwen2.5-VL's mRoPE (3-section multimodal rope) degenerates to standard 1D
rope for text-only inputs — every section sees identical position ids — so
for prompt encoding (no images reach the text encoder in QwenImage) plain
rope is exact. The vision tower is not needed and its weights are skipped on
load.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Embedding, Module, ModuleList
from ..modeling_utils import ModelMixin, convert_torch_state_dict
from .llama import LlamaDecoderLayer, LlamaEncoderOutput, LlamaRMSNorm

_QWEN_CONFIG_KEYS = (
    "vocab_size", "hidden_size", "intermediate_size", "num_hidden_layers", "num_attention_heads",
    "num_key_value_heads", "head_dim", "rms_norm_eps", "rope_theta",
)


class Qwen2_5_VLTextEncoder(Module, ModelMixin, ConfigMixin):
    """Text-only Qwen2.5-VL trunk (loads `Qwen2_5_VLForConditionalGeneration`
    checkpoints, ignoring the `visual.` tower)."""

    @register_to_config
    def __init__(
        self,
        vocab_size: int = 152064,
        hidden_size: int = 3584,
        intermediate_size: int = 18944,
        num_hidden_layers: int = 28,
        num_attention_heads: int = 28,
        num_key_value_heads: int = 4,
        head_dim: Optional[int] = None,
        rms_norm_eps: float = 1e-6,
        rope_theta: float = 1000000.0,
    ):
        super().__init__()
        head_dim = head_dim or hidden_size // num_attention_heads
        self.embed_tokens = Embedding(vocab_size, hidden_size)
        self.layers = ModuleList(
            [
                LlamaDecoderLayer(hidden_size, intermediate_size, num_attention_heads,
                                  num_key_value_heads, head_dim, rms_norm_eps, rope_theta,
                                  attention_bias=True)
                for _ in range(num_hidden_layers)
            ]
        )
        self.norm = LlamaRMSNorm(hidden_size, rms_norm_eps)

    def __call__(self, params, input_ids, attention_mask=None, output_hidden_states=False):
        import jax

        x = self.embed_tokens(params["embed_tokens"], input_ids)
        positions = jnp.broadcast_to(jnp.arange(input_ids.shape[1]), input_ids.shape)
        hidden_states = [x] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][i], x, positions, attention_mask)
            if output_hidden_states:
                hidden_states.append(x)
        x = self.norm(params["norm"], x)
        if output_hidden_states:
            hidden_states[-1] = x
        return LlamaEncoderOutput(
            last_hidden_state=x,
            hidden_states=tuple(hidden_states) if output_hidden_states else None,
        )

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path, subfolder=None, dtype=None, variant=None,
                        quantization_config=None, **kwargs):
        from safetensors import safe_open

        from ...quantizers.quantize import maybe_quantize
        from ...utils.hub_utils import snapshot_download_repo
        from ...utils.jax_utils import resolve_dtype

        root = str(pretrained_model_name_or_path)
        if not os.path.isdir(root):
            root = snapshot_download_repo(root, **kwargs)
        model_path = os.path.join(root, subfolder) if subfolder else root
        with open(os.path.join(model_path, "config.json")) as f:
            full = json.load(f)
        text_cfg = full.get("text_config", full)
        model = cls(**{k: text_cfg[k] for k in _QWEN_CONFIG_KEYS if k in text_cfg})

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
                    if "visual" in k.split(".")[:2] or k == "lm_head.weight":
                        continue  # vision tower / LM head not needed for prompt encoding
                    # nesting varies by transformers version: model.*,
                    # model.language_model.*, or language_model.model.*
                    key = k
                    while key.startswith(("model.", "language_model.")):
                        key = key.removeprefix("model.").removeprefix("language_model.")
                    state[key] = f.get_tensor(k)
        params = convert_torch_state_dict(model, state, dtype=resolve_dtype(dtype, default=None))
        params = maybe_quantize(params, quantization_config)
        return model, params

    def save_pretrained(self, save_directory, params, **kwargs):
        from .clip import _save_transformers_style

        _save_transformers_style(self, save_directory, params)
