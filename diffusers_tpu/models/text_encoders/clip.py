"""CLIP text encoder — JAX-native implementation loading transformers
checkpoints.

The reference delegates text encoding to `transformers.CLIPTextModel`
(crossed into at `pipelines/flux/pipeline_flux.py:777` encode_prompt and every
SD pipeline). Here it is a first-class TPU model: same parameter names as the
transformers state dict (``text_model.encoder.layers.N.self_attn.q_proj`` …),
causal attention through our dispatch layer, and the SD-family contracts:

  * `last_hidden_state` + per-layer `hidden_states` (SDXL reads the
    penultimate layer, "clip skip" reads earlier ones)
  * `pooler_output` at the EOS token position
  * `CLIPTextModelWithProjection.text_embeds` for SDXL's pooled embeddings
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...ops.attention import dispatch_attention_fn
from ...ops.module import Embedding, LayerNorm, Linear, Module, ModuleList, Params, get_activation
from ...utils import BaseOutput
from ..modeling_utils import ModelMixin, convert_torch_state_dict


@dataclass
class CLIPTextModelOutput(BaseOutput):
    last_hidden_state: jax.Array
    pooler_output: Optional[jax.Array] = None
    hidden_states: Optional[Tuple[jax.Array, ...]] = None
    text_embeds: Optional[jax.Array] = None


class CLIPAttention(Module):
    def __init__(self, embed_dim: int, num_heads: int):
        super().__init__()
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.q_proj = Linear(embed_dim, embed_dim)
        self.k_proj = Linear(embed_dim, embed_dim)
        self.v_proj = Linear(embed_dim, embed_dim)
        self.out_proj = Linear(embed_dim, embed_dim)

    def __call__(self, params: Params, x: jax.Array, causal_mask: Optional[jax.Array]) -> jax.Array:
        b, s, _ = x.shape
        q = self.q_proj(params["q_proj"], x).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], x).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], x).reshape(b, s, self.num_heads, self.head_dim)
        out = dispatch_attention_fn(q, k, v, attn_mask=causal_mask, backend="native")
        out = out.reshape(b, s, self.embed_dim)
        return self.out_proj(params["out_proj"], out)


class CLIPMLP(Module):
    def __init__(self, embed_dim: int, intermediate_size: int, hidden_act: str):
        super().__init__()
        self.fc1 = Linear(embed_dim, intermediate_size)
        self.fc2 = Linear(intermediate_size, embed_dim)
        self.act = get_activation(hidden_act)

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class CLIPEncoderLayer(Module):
    def __init__(self, embed_dim: int, num_heads: int, intermediate_size: int, hidden_act: str, eps: float):
        super().__init__()
        self.self_attn = CLIPAttention(embed_dim, num_heads)
        self.layer_norm1 = LayerNorm(embed_dim, eps=eps)
        self.mlp = CLIPMLP(embed_dim, intermediate_size, hidden_act)
        self.layer_norm2 = LayerNorm(embed_dim, eps=eps)

    def __call__(self, params: Params, x: jax.Array, causal_mask: Optional[jax.Array]) -> jax.Array:
        residual = x
        x = self.layer_norm1(params["layer_norm1"], x)
        x = self.self_attn(params["self_attn"], x, causal_mask)
        x = residual + x
        residual = x
        x = self.layer_norm2(params["layer_norm2"], x)
        x = self.mlp(params["mlp"], x)
        return residual + x


class CLIPTextEmbeddings(Module):
    def __init__(self, vocab_size: int, embed_dim: int, max_position_embeddings: int):
        super().__init__()
        self.token_embedding = Embedding(vocab_size, embed_dim)
        self.position_embedding = Embedding(max_position_embeddings, embed_dim)

    def __call__(self, params: Params, input_ids: jax.Array, position_ids: Optional[jax.Array] = None) -> jax.Array:
        s = input_ids.shape[-1]
        if position_ids is None:
            position_ids = jnp.arange(s)[None, :]
        tok = self.token_embedding(params["token_embedding"], input_ids)
        pos = self.position_embedding(params["position_embedding"], position_ids)
        return tok + pos


class CLIPTextTransformer(Module):
    def __init__(self, config: dict):
        super().__init__()
        self.cfg = config
        embed_dim = config["hidden_size"]
        self.embeddings = CLIPTextEmbeddings(config["vocab_size"], embed_dim, config["max_position_embeddings"])
        self.encoder = _CLIPEncoder(config)
        self.final_layer_norm = LayerNorm(embed_dim, eps=config.get("layer_norm_eps", 1e-5))

    def __call__(self, params, input_ids, position_ids=None, output_hidden_states=False):
        hidden = self.embeddings(params["embeddings"], input_ids, position_ids)
        s = input_ids.shape[-1]
        causal = jnp.tril(jnp.ones((s, s), dtype=bool))[None, None]  # [1,1,S,S]

        all_hidden = [hidden] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layers):
            hidden = layer(params["encoder"]["layers"][i], hidden, causal)
            if output_hidden_states:
                all_hidden.append(hidden)

        last_hidden = self.final_layer_norm(params["final_layer_norm"], hidden)

        eos_token_id = self.cfg.get("eos_token_id", 2)
        if eos_token_id == 2:
            # canonical CLIP: eos has the highest token id (transformers behavior)
            eos_positions = jnp.argmax(input_ids, axis=-1)
        else:
            eos_positions = jnp.argmax((input_ids == eos_token_id).astype(jnp.int32), axis=-1)
        pooled = last_hidden[jnp.arange(last_hidden.shape[0]), eos_positions]
        return last_hidden, pooled, tuple(all_hidden) if output_hidden_states else None


class _CLIPEncoder(Module):
    def __init__(self, config: dict):
        super().__init__()
        self.layers = ModuleList(
            [
                CLIPEncoderLayer(
                    config["hidden_size"],
                    config["num_attention_heads"],
                    config["intermediate_size"],
                    config.get("hidden_act", "quick_gelu"),
                    config.get("layer_norm_eps", 1e-5),
                )
                for _ in range(config["num_hidden_layers"])
            ]
        )


_CLIP_CONFIG_KEYS = [
    "vocab_size",
    "hidden_size",
    "intermediate_size",
    "num_hidden_layers",
    "num_attention_heads",
    "max_position_embeddings",
    "hidden_act",
    "layer_norm_eps",
    "projection_dim",
    "eos_token_id",
    "bos_token_id",
]


class CLIPTextModel(Module, ModelMixin, ConfigMixin):
    """Matches transformers.CLIPTextModel checkpoint layout."""

    has_projection = False

    @register_to_config
    def __init__(
        self,
        vocab_size: int = 49408,
        hidden_size: int = 512,
        intermediate_size: int = 2048,
        num_hidden_layers: int = 12,
        num_attention_heads: int = 8,
        max_position_embeddings: int = 77,
        hidden_act: str = "quick_gelu",
        layer_norm_eps: float = 1e-5,
        projection_dim: int = 512,
        eos_token_id: int = 2,
        bos_token_id: int = 49406,
        **kwargs,
    ):
        super().__init__()
        cfg = dict(
            vocab_size=vocab_size,
            hidden_size=hidden_size,
            intermediate_size=intermediate_size,
            num_hidden_layers=num_hidden_layers,
            num_attention_heads=num_attention_heads,
            max_position_embeddings=max_position_embeddings,
            hidden_act=hidden_act,
            layer_norm_eps=layer_norm_eps,
            eos_token_id=eos_token_id,
        )
        self.text_model = CLIPTextTransformer(cfg)
        if self.has_projection:
            self.text_projection = Linear(hidden_size, projection_dim, use_bias=False)

    def __call__(
        self,
        params: Params,
        input_ids: jax.Array,
        position_ids: Optional[jax.Array] = None,
        output_hidden_states: bool = False,
    ) -> CLIPTextModelOutput:
        last_hidden, pooled, all_hidden = self.text_model(
            params["text_model"], input_ids, position_ids, output_hidden_states
        )
        text_embeds = None
        if self.has_projection:
            text_embeds = self.text_projection(params["text_projection"], pooled)
        return CLIPTextModelOutput(
            last_hidden_state=last_hidden,
            pooler_output=pooled,
            hidden_states=all_hidden,
            text_embeds=text_embeds,
        )

    # transformers checkpoints use model.safetensors + a transformers config.json
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
        init_kwargs = {k: full_config[k] for k in _CLIP_CONFIG_KEYS if k in full_config}
        model = cls(**init_kwargs)

        weights_file = "model.safetensors" if variant is None else f"model.{variant}.safetensors"
        path = os.path.join(model_path, weights_file)
        if not os.path.isfile(path):
            raise EnvironmentError(f"no weights at {path}")
        state = {}
        with safe_open(path, framework="numpy") as f:
            for k in f.keys():
                if k.startswith("text_model.") or k.startswith("text_projection"):
                    state[k] = f.get_tensor(k)
        # transformers sometimes stores position_ids buffers — drop them
        state = {k: v for k, v in state.items() if not k.endswith("position_ids")}
        params = convert_torch_state_dict(model, state, dtype=resolve_dtype(dtype, default=None))
        from ...quantizers.quantize import maybe_quantize

        params = maybe_quantize(params, quantization_config)
        return model, params


    def save_pretrained(self, save_directory, params, **kwargs):
        """transformers layout: model.safetensors (+ config.json)."""
        _save_transformers_style(self, save_directory, params)


class CLIPTextModelWithProjection(CLIPTextModel):
    has_projection = True


def _save_transformers_style(model, save_directory, params):
    from safetensors.numpy import save_file

    from ..modeling_utils import flatten_to_torch_state_dict

    os.makedirs(save_directory, exist_ok=True)
    model.save_config(save_directory)
    state_dict = flatten_to_torch_state_dict(model, params)
    state_dict = {k: np.ascontiguousarray(v) for k, v in state_dict.items()}
    save_file(state_dict, os.path.join(save_directory, "model.safetensors"))


# ---------------------------------------------------------------------------
# CLIP vision tower (IP-Adapter image encoder; reference pipelines cross into
# transformers.CLIPVisionModelWithProjection, e.g. pipeline encode_image)
# ---------------------------------------------------------------------------


@dataclass
class CLIPVisionModelOutput(BaseOutput):
    last_hidden_state: jax.Array
    pooler_output: Optional[jax.Array] = None
    hidden_states: Optional[Tuple[jax.Array, ...]] = None
    image_embeds: Optional[jax.Array] = None


class CLIPVisionEmbeddings(Module):
    def __init__(self, embed_dim: int, image_size: int, patch_size: int, num_channels: int = 3):
        super().__init__()
        from ...ops.module import Conv2d

        self.embed_dim = embed_dim
        self.patch_embedding = Conv2d(num_channels, embed_dim, kernel_size=patch_size, stride=patch_size, use_bias=False)
        num_positions = (image_size // patch_size) ** 2 + 1
        self.position_embedding = Embedding(num_positions, embed_dim)

    def init(self, key, dtype=jnp.float32) -> Params:
        params = super().init(key, dtype=dtype)
        params["class_embedding"] = (jax.random.normal(key, (self.embed_dim,)) * self.embed_dim**-0.5).astype(dtype)
        return params

    def __call__(self, params: Params, pixel_values: jax.Array) -> jax.Array:
        # pixel_values NCHW (transformers contract) → NHWC internally
        x = jnp.transpose(pixel_values, (0, 2, 3, 1))
        patches = self.patch_embedding(params["patch_embedding"], x)  # [B, h, w, D]
        b = patches.shape[0]
        patches = patches.reshape(b, -1, self.embed_dim)
        cls = jnp.broadcast_to(params["class_embedding"].astype(patches.dtype), (b, 1, self.embed_dim))
        embeds = jnp.concatenate([cls, patches], axis=1)
        pos_ids = jnp.arange(embeds.shape[1])[None]
        return embeds + self.position_embedding(params["position_embedding"], pos_ids)


class CLIPVisionTransformer(Module):
    def __init__(self, config: dict):
        super().__init__()
        embed_dim = config["hidden_size"]
        eps = config.get("layer_norm_eps", 1e-5)
        self.embeddings = CLIPVisionEmbeddings(
            embed_dim, config["image_size"], config["patch_size"], config.get("num_channels", 3)
        )
        # "pre_layrnorm": the transformers checkpoint key is (sic) misspelled
        self.pre_layrnorm = LayerNorm(embed_dim, eps=eps)
        self.encoder = _CLIPEncoder(config)
        self.post_layernorm = LayerNorm(embed_dim, eps=eps)

    def __call__(self, params, pixel_values, output_hidden_states=False):
        hidden = self.embeddings(params["embeddings"], pixel_values)
        hidden = self.pre_layrnorm(params["pre_layrnorm"], hidden)
        all_hidden = [hidden] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layers):
            hidden = layer(params["encoder"]["layers"][i], hidden, None)
            if output_hidden_states:
                all_hidden.append(hidden)
        pooled = self.post_layernorm(params["post_layernorm"], hidden[:, 0])
        return hidden, pooled, tuple(all_hidden) if output_hidden_states else None


_CLIP_VISION_CONFIG_KEYS = [
    "hidden_size",
    "intermediate_size",
    "num_hidden_layers",
    "num_attention_heads",
    "image_size",
    "patch_size",
    "num_channels",
    "hidden_act",
    "layer_norm_eps",
    "projection_dim",
]


class CLIPVisionModel(Module, ModelMixin, ConfigMixin):
    """Matches transformers.CLIPVisionModel(WithProjection) checkpoint layout."""

    has_projection = False

    @register_to_config
    def __init__(
        self,
        hidden_size: int = 1024,
        intermediate_size: int = 4096,
        num_hidden_layers: int = 24,
        num_attention_heads: int = 16,
        image_size: int = 224,
        patch_size: int = 14,
        num_channels: int = 3,
        hidden_act: str = "quick_gelu",
        layer_norm_eps: float = 1e-5,
        projection_dim: int = 768,
        **kwargs,
    ):
        super().__init__()
        cfg = dict(
            hidden_size=hidden_size,
            intermediate_size=intermediate_size,
            num_hidden_layers=num_hidden_layers,
            num_attention_heads=num_attention_heads,
            image_size=image_size,
            patch_size=patch_size,
            num_channels=num_channels,
            hidden_act=hidden_act,
            layer_norm_eps=layer_norm_eps,
        )
        self.vision_model = CLIPVisionTransformer(cfg)
        if self.has_projection:
            self.visual_projection = Linear(hidden_size, projection_dim, use_bias=False)

    def __call__(
        self,
        params: Params,
        pixel_values: jax.Array,
        output_hidden_states: bool = False,
    ) -> CLIPVisionModelOutput:
        last_hidden, pooled, all_hidden = self.vision_model(params["vision_model"], pixel_values, output_hidden_states)
        image_embeds = None
        if self.has_projection:
            image_embeds = self.visual_projection(params["visual_projection"], pooled)
        return CLIPVisionModelOutput(
            last_hidden_state=last_hidden,
            pooler_output=pooled,
            hidden_states=all_hidden,
            image_embeds=image_embeds,
        )

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
        init_kwargs = {k: full_config[k] for k in _CLIP_VISION_CONFIG_KEYS if k in full_config}
        model = cls(**init_kwargs)

        weights_file = "model.safetensors" if variant is None else f"model.{variant}.safetensors"
        path = os.path.join(model_path, weights_file)
        if not os.path.isfile(path):
            raise EnvironmentError(f"no weights at {path}")
        state = {}
        with safe_open(path, framework="numpy") as f:
            for k in f.keys():
                if k.startswith("vision_model.") or k.startswith("visual_projection"):
                    state[k] = f.get_tensor(k)
        state = {k: v for k, v in state.items() if not k.endswith("position_ids")}
        params = convert_torch_state_dict(model, state, dtype=resolve_dtype(dtype, default=None))
        from ...quantizers.quantize import maybe_quantize

        params = maybe_quantize(params, quantization_config)
        return model, params


    def save_pretrained(self, save_directory, params, **kwargs):
        """transformers layout: model.safetensors (+ config.json)."""
        _save_transformers_style(self, save_directory, params)


class CLIPVisionModelWithProjection(CLIPVisionModel):
    has_projection = True
