"""ModelMixin: config-driven model construction + checkpoint I/O.

TPU-native counterpart of the reference
(`/root/reference/src/diffusers/models/modeling_utils.py:236` ModelMixin,
`:880` from_pretrained, `:673` save_pretrained). Reads the reference's exact
on-disk layout — `config.json` + `diffusion_pytorch_model.safetensors`
(sharded via `diffusion_pytorch_model.safetensors.index.json`, fp16 variants) —
and converts the torch state dict into this framework's parameter pytree:

  * keys: dotted paths split into nested dicts (numeric segments → int keys)
  * linear ``weight [out,in]`` → ``kernel [in,out]``
  * conv   ``weight OIHW/OIDHW`` → ``kernel HWIO/DHWIO``
  * norm   ``weight`` → ``scale``
  * embedding ``weight`` → ``embedding``

The conversion is structural (driven by the module tree), so no per-model
rename tables are needed — mirroring the fact that our module attribute names
equal the reference's.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import ConfigMixin
from ..utils import logging
from ..utils.jax_utils import resolve_dtype
from ..ops.module import (
    Conv2d,
    Conv3d,
    Embedding,
    GroupNorm,
    LayerNorm,
    Linear,
    Module,
    ModuleList,
    Params,
    RMSNorm,
)

logger = logging.get_logger(__name__)

SAFETENSORS_WEIGHTS_NAME = "diffusion_pytorch_model.safetensors"
SAFETENSORS_INDEX_NAME = "diffusion_pytorch_model.safetensors.index.json"
CONFIG_NAME = "config.json"


# ---------------------------------------------------------------------------
# torch <-> pytree layout conversion
# ---------------------------------------------------------------------------


def _leaf_convert_from_torch(leaf: Module, pname: str, tensor: np.ndarray):
    """(param_name, array) in our convention for a torch leaf tensor."""
    if hasattr(leaf, "convert_torch_param"):  # model-specific leaf override
        return leaf.convert_torch_param(pname, tensor)
    if isinstance(leaf, Linear):
        if pname == "weight":
            return "kernel", tensor.T
        return pname, tensor
    if isinstance(leaf, Conv2d):
        if pname == "weight":  # OIHW -> HWIO
            return "kernel", tensor.transpose(2, 3, 1, 0)
        return pname, tensor
    if isinstance(leaf, Conv3d):
        if pname == "weight":  # OIDHW -> DHWIO
            return "kernel", tensor.transpose(2, 3, 4, 1, 0)
        return pname, tensor
    if isinstance(leaf, (GroupNorm, LayerNorm, RMSNorm)):
        if pname == "weight":
            return "scale", tensor
        return pname, tensor
    if isinstance(leaf, Embedding):
        if pname == "weight":
            return "embedding", tensor
        return pname, tensor
    return pname, tensor


def _leaf_convert_to_torch(leaf: Module, pname: str, array: np.ndarray):
    if hasattr(leaf, "convert_param_to_torch"):
        return leaf.convert_param_to_torch(pname, array)
    if isinstance(leaf, Linear) and pname == "kernel":
        return "weight", array.T
    if isinstance(leaf, Conv2d) and pname == "kernel":
        return "weight", array.transpose(3, 2, 0, 1)
    if isinstance(leaf, Conv3d) and pname == "kernel":
        return "weight", array.transpose(4, 3, 0, 1, 2)
    if isinstance(leaf, (GroupNorm, LayerNorm, RMSNorm)) and pname == "scale":
        return "weight", array
    if isinstance(leaf, Embedding) and pname == "embedding":
        return "weight", array
    return pname, array


def _resolve_module(root: Module, parts):
    """Walk the module tree along dotted-path segments; returns (leaf_module,
    normalized_path_segments, param_name) with numeric segments as ints.
    param_name is None when an intermediate segment fails to resolve."""
    mod = root
    path = []
    for i, seg in enumerate(parts):
        is_last = i == len(parts) - 1
        if isinstance(mod, ModuleList) and seg.isdigit() and int(seg) < len(mod):
            mod = mod[int(seg)]
            path.append(int(seg))
        elif seg in getattr(mod, "_children", {}):
            mod = mod._children[seg]
            path.append(seg)
        elif is_last:
            return mod, path, seg
        else:
            return mod, path, None
    # full path resolved to a module with no trailing param name — unexpected
    return mod, path, None


def _set_nested(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_torch_state_dict(root: Module, state_dict: Dict[str, np.ndarray], dtype=None) -> Params:
    """torch state-dict → parameter pytree (see module docstring)."""
    params: Params = {}
    unmatched = []
    for key, tensor in state_dict.items():
        parts = key.split(".")
        leaf, path, pname = _resolve_module(root, parts)
        if pname is None:
            unmatched.append(key)
            continue
        # remaining unresolved segments beyond the leaf are part of the name
        name, value = _leaf_convert_from_torch(leaf, pname, np.asarray(tensor))
        if dtype is not None:
            value = value.astype(dtype)
        _set_nested(params, path + [name], jnp.asarray(value))
    if unmatched:
        logger.warning(f"{len(unmatched)} checkpoint keys had no matching module path, e.g. {unmatched[:5]}")
    return params


def flatten_to_torch_state_dict(root: Module, params: Params) -> Dict[str, np.ndarray]:
    """parameter pytree → torch-layout flat state dict (for save_pretrained)."""
    out: Dict[str, np.ndarray] = {}

    def walk(mod: Module, tree: Dict, prefix: str):
        for k, v in tree.items():
            key = f"{prefix}{k}" if prefix == "" else f"{prefix}.{k}"
            if isinstance(v, dict):
                child = mod._children.get(k) if not isinstance(mod, ModuleList) else mod[int(k)]
                walk(child, v, key)
            else:
                name, arr = _leaf_convert_to_torch(mod, k, np.asarray(v))
                out[f"{prefix}.{name}" if prefix else name] = arr

    walk(root, params, "")
    return out


# ---------------------------------------------------------------------------
# Checkpoint file I/O
# ---------------------------------------------------------------------------


def load_safetensors_state_dict(model_path: str, variant: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Load (possibly sharded) safetensors into numpy, following the
    reference's file-selection rules (`model_loading_utils.py:504`)."""
    from safetensors import safe_open

    def weights_name(base=SAFETENSORS_WEIGHTS_NAME):
        if variant:
            stem, ext = base.rsplit(".", 1)
            return f"{stem}.{variant}.{ext}"
        return base

    index_name = weights_name(SAFETENSORS_INDEX_NAME.replace(".index.json", "")) + ".index.json" if variant else SAFETENSORS_INDEX_NAME
    index_path = os.path.join(model_path, index_name)
    single_path = os.path.join(model_path, weights_name())

    if os.path.isfile(index_path):
        with open(index_path) as f:
            index = json.load(f)
        shard_files = sorted(set(index["weight_map"].values()))
        state = {}
        for shard in shard_files:
            with safe_open(os.path.join(model_path, shard), framework="numpy") as f:
                for k in f.keys():
                    state[k] = f.get_tensor(k)
        return state
    if os.path.isfile(single_path):
        state = {}
        with safe_open(single_path, framework="numpy") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
        return state
    raise EnvironmentError(f"No safetensors weights found under {model_path} (looked for {single_path} / index)")


class ModelMixin(ConfigMixin):
    """Base for all models: construction from config + checkpoint load/save.

    Unlike the reference's nn.Module, instances hold no parameters; they are
    pure structure. `from_pretrained` returns `(model, params)`.
    """

    config_name = CONFIG_NAME

    def init_params(self, key: Optional[jax.Array] = None, dtype=jnp.float32) -> Params:
        if key is None:
            key = jax.random.PRNGKey(0)
        return self.init(key, dtype=dtype)

    @classmethod
    def from_config_file(cls, path: str, **overrides):
        config = cls.load_config(path)
        return cls.from_config(config, **overrides)

    @classmethod
    def from_pretrained(
        cls,
        pretrained_model_name_or_path: Union[str, os.PathLike],
        subfolder: Optional[str] = None,
        dtype: Union[str, jnp.dtype, None] = None,
        variant: Optional[str] = None,
        quantization_config=None,
        gguf_file: Optional[str] = None,
        **kwargs,
    ):
        """Load config + weights. Returns ``(model, params)``.

        `quantization_config` triggers the load-time quantizer lifecycle
        (reference `quantizers/base.py:34` hooks → here one functional
        transform after the state dict is converted). `gguf_file` loads the
        weights from a GGUF checkpoint instead of safetensors (reference
        `model_loading_utils.py:644`), dequantized then (optionally)
        re-quantized into the TPU int8 path by `quantization_config`.
        """
        from ..utils.hub_utils import snapshot_download_repo

        root = str(pretrained_model_name_or_path)
        if not os.path.isdir(root) and gguf_file is None:
            root = snapshot_download_repo(root, **kwargs)
        model_path = os.path.join(root, subfolder) if subfolder else root

        config = cls.load_config(model_path)
        model, unused = cls.from_config(config, return_unused_kwargs=True, **kwargs)
        if gguf_file is not None:
            from ..quantizers.gguf import load_gguf_checkpoint

            state_dict = load_gguf_checkpoint(
                gguf_file if os.path.isabs(gguf_file) else os.path.join(model_path, gguf_file)
            )
        else:
            state_dict = load_safetensors_state_dict(model_path, variant=variant)
        params = convert_torch_state_dict(model, state_dict, dtype=resolve_dtype(dtype, default=None))
        if quantization_config is not None:
            from ..quantizers.auto import resolve_quantization_config
            from ..quantizers.quantize import quantize_params

            qc = resolve_quantization_config(quantization_config)
            if qc is not None:
                params = quantize_params(params, qc)
        return model, params

    def save_pretrained(self, save_directory: Union[str, os.PathLike], params: Params, **kwargs):
        from safetensors.numpy import save_file

        os.makedirs(save_directory, exist_ok=True)
        self.save_config(save_directory)
        state_dict = flatten_to_torch_state_dict(self, params)
        # safetensors silently serializes the base buffer of non-contiguous
        # arrays (our layout transposes produce views) — force contiguity.
        state_dict = {k: np.ascontiguousarray(v) for k, v in state_dict.items()}
        save_file(state_dict, os.path.join(save_directory, SAFETENSORS_WEIGHTS_NAME))

    @property
    def dtype(self):
        return jnp.float32
