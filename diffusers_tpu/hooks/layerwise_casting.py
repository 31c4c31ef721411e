"""Layerwise casting: fp8 weight *storage* with bf16 compute.

Counterpart of the reference hook (`/root/reference/src/diffusers/hooks/
layerwise_casting.py:101` apply_layerwise_casting + DEFAULT_SKIP_MODULES_PATTERN):
weights of non-sensitive layers are stored in fp8-e4m3/e5m2 and upcast to the
compute dtype at the point of use. The reference installs pre/post-forward
cast hooks per module; here the storage cast is a pure pytree transform —
`ops.module.Linear`/`Conv2d` already upcast `kernel.astype(x.dtype)` inside
the forward, so the upcast fuses into the matmul read and no hook machinery
is needed. Halves HBM weight traffic like the reference, with the same
quality envelope.
"""

from __future__ import annotations

import re
from typing import Iterable, Tuple

import jax
import jax.numpy as jnp

# Reference defaults (layerwise_casting.py:40): keep positional/patch
# embeddings, norms, and the I/O projections in compute dtype.
DEFAULT_SKIP_MODULES_PATTERN: Tuple[str, ...] = (
    "pos_embed",
    "patch_embed",
    "norm",
    "(^|\\.)proj_in($|\\.)",
    "(^|\\.)proj_out($|\\.)",
)

_FLOAT_DTYPES = (jnp.float32, jnp.bfloat16, jnp.float16)


def _resolve_storage_dtype(storage_dtype):
    if isinstance(storage_dtype, str):
        return {
            "float8_e4m3fn": jnp.float8_e4m3fn,
            "float8_e5m2": jnp.float8_e5m2,
            "bfloat16": jnp.bfloat16,
            "float16": jnp.float16,
        }[storage_dtype]
    return storage_dtype


def apply_layerwise_casting(
    params,
    storage_dtype="float8_e4m3fn",
    skip_modules_pattern: Iterable[str] = DEFAULT_SKIP_MODULES_PATTERN,
    _path: str = "",
):
    """Cast eligible weight tensors to `storage_dtype`. Biases, scalars/1-D
    tensors (norm scales), already-quantized kernels, and path-pattern-matched
    modules are left untouched."""
    storage = _resolve_storage_dtype(storage_dtype)
    patterns = [re.compile(p) for p in skip_modules_pattern]

    def cast(tree, path):
        if isinstance(tree, dict):
            if any(p.search(path) for p in patterns):
                return tree
            if "kernel_scale" in tree or "kernel_scale_w8a8" in tree:
                return tree  # already int8/fp8-quantized with scales
            return {
                k: cast(v, f"{path}.{k}" if path else str(k)) if isinstance(v, dict)
                else _cast_leaf(k, v, path)
                for k, v in tree.items()
            }
        return tree

    def _cast_leaf(name, leaf, path):
        if any(p.search(f"{path}.{name}")for p in patterns):
            return leaf
        if name in ("kernel", "weight") and getattr(leaf, "ndim", 0) >= 2 and leaf.dtype in _FLOAT_DTYPES:
            return leaf.astype(storage)
        return leaf

    return cast(params, _path)


def remove_layerwise_casting(params, dtype=jnp.float32):
    """Upcast fp8-stored weights back to a full-precision dtype."""

    def up(leaf):
        if hasattr(leaf, "dtype") and leaf.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(up, params)
