"""CLAP text tower — Roberta encoder + 2-layer projection.

Matches the transformers `ClapTextModelWithProjection` checkpoint layout
(text_model.embeddings/encoder/pooler + text_projection.linear1/linear2);
a full `ClapModel` checkpoint loads too (its audio tower keys are ignored).
`get_text_features` mirrors `ClapModel.get_text_features`: projected pooled
output, L2-normalized.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.module import Linear, Module, ModuleList, Params
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin
from .xlm_roberta import _BertLayer, _RobertaEmbeddings


@dataclass
class ClapTextOutput(BaseOutput):
    last_hidden_state: jax.Array
    pooler_output: Optional[jax.Array] = None
    text_embeds: Optional[jax.Array] = None


class _ClapTextPooler(Module):
    def __init__(self, hidden_size: int):
        super().__init__()
        self.dense = Linear(hidden_size, hidden_size)

    def __call__(self, params: Params, hidden_states: jax.Array) -> jax.Array:
        return jnp.tanh(self.dense(params["dense"], hidden_states[:, 0]))


class _ClapProjectionLayer(Module):
    def __init__(self, hidden_size: int, projection_dim: int):
        super().__init__()
        self.linear1 = Linear(hidden_size, projection_dim)
        self.linear2 = Linear(projection_dim, projection_dim)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.linear2(params["linear2"], jax.nn.relu(self.linear1(params["linear1"], x)))


class _ClapTextEncoder(Module):
    def __init__(self, hidden_size, num_layers, num_heads, intermediate_size, eps):
        super().__init__()
        self.layer = ModuleList(
            [_BertLayer(hidden_size, num_heads, intermediate_size, eps) for _ in range(num_layers)]
        )

    def __call__(self, params, x, attention_mask):
        for i, layer in enumerate(self.layer):
            x = layer(params["layer"][i], x, attention_mask)
        return x


class _ClapTextModel(Module):
    def __init__(self, config: dict):
        super().__init__()
        self.embeddings = _RobertaEmbeddings(
            config.get("vocab_size", 50265), config.get("hidden_size", 768),
            config.get("max_position_embeddings", 514), config.get("type_vocab_size", 1),
            config.get("pad_token_id", 1), config.get("layer_norm_eps", 1e-12))
        self.encoder = _ClapTextEncoder(
            config.get("hidden_size", 768), config.get("num_hidden_layers", 12),
            config.get("num_attention_heads", 12), config.get("intermediate_size", 3072),
            config.get("layer_norm_eps", 1e-12))
        self.pooler = _ClapTextPooler(config.get("hidden_size", 768))

    def __call__(self, params, input_ids, attention_mask=None):
        x = self.embeddings(params["embeddings"], input_ids)
        x = self.encoder(params["encoder"], x, attention_mask)
        pooled = self.pooler(params["pooler"], x)
        return x, pooled


class ClapTextModelWithProjection(Module, ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(
        self,
        vocab_size: int = 50265,
        hidden_size: int = 768,
        num_hidden_layers: int = 12,
        num_attention_heads: int = 12,
        intermediate_size: int = 3072,
        max_position_embeddings: int = 514,
        type_vocab_size: int = 1,
        pad_token_id: int = 1,
        layer_norm_eps: float = 1e-12,
        projection_dim: int = 512,
        **unused,
    ):
        super().__init__()
        # a full ClapModel config nests the text tower under `text_config`
        tc = unused.get("text_config")
        if isinstance(tc, dict):
            vocab_size = tc.get("vocab_size", vocab_size)
            hidden_size = tc.get("hidden_size", hidden_size)
            num_hidden_layers = tc.get("num_hidden_layers", num_hidden_layers)
            num_attention_heads = tc.get("num_attention_heads", num_attention_heads)
            intermediate_size = tc.get("intermediate_size", intermediate_size)
            max_position_embeddings = tc.get("max_position_embeddings", max_position_embeddings)
            type_vocab_size = tc.get("type_vocab_size", type_vocab_size)
            pad_token_id = tc.get("pad_token_id", pad_token_id)
            layer_norm_eps = tc.get("layer_norm_eps", layer_norm_eps)
            projection_dim = tc.get("projection_dim", projection_dim)
        cfg = dict(vocab_size=vocab_size, hidden_size=hidden_size,
                   num_hidden_layers=num_hidden_layers, num_attention_heads=num_attention_heads,
                   intermediate_size=intermediate_size,
                   max_position_embeddings=max_position_embeddings,
                   type_vocab_size=type_vocab_size, pad_token_id=pad_token_id,
                   layer_norm_eps=layer_norm_eps)
        self.text_model = _ClapTextModel(cfg)
        self.text_projection = _ClapProjectionLayer(hidden_size, projection_dim)

    def __call__(self, params: Params, input_ids: jax.Array,
                 attention_mask: Optional[jax.Array] = None) -> ClapTextOutput:
        last_hidden, pooled = self.text_model(params["text_model"], input_ids, attention_mask)
        text_embeds = self.text_projection(params["text_projection"], pooled)
        return ClapTextOutput(last_hidden_state=last_hidden, pooler_output=pooled,
                              text_embeds=text_embeds)

    def get_text_features(self, params: Params, input_ids: jax.Array,
                          attention_mask: Optional[jax.Array] = None) -> jax.Array:
        """ClapModel.get_text_features parity: projected pooled output, L2-normalized."""
        out = self(params, input_ids, attention_mask=attention_mask)
        feats = out.text_embeds
        return feats / jnp.maximum(jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)

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
                if k.startswith(("text_model.", "text_projection.")) and not k.endswith(
                        ("position_ids", "token_type_ids")):
                    state[k] = f.get_tensor(k)
        from ..modeling_utils import convert_torch_state_dict

        params = convert_torch_state_dict(model, state, dtype=resolve_dtype(dtype, default=None))
        from ...quantizers.quantize import maybe_quantize

        return model, maybe_quantize(params, quantization_config)

    def save_pretrained(self, save_directory, params, **kwargs):
        from .clip import _save_transformers_style

        _save_transformers_style(self, save_directory, params)
