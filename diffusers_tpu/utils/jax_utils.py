"""JAX-native tensor utilities: RNG with per-sample reproducibility, dtype
helpers, and device placement.

This is the TPU-native counterpart of the reference's `utils/torch_utils.py`:
``randn_tensor`` (`torch_utils.py:183`) provides per-sample generator
semantics; here the same contract is expressed with `jax.random` keys
(splitting per batch element), plus an escape hatch to consume
externally-generated noise (e.g. torch-CPU noise for golden-parity tests).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import logging

logger = logging.get_logger(__name__)


def randn_tensor(
    shape: Sequence[int],
    key: Optional[jax.Array] = None,
    dtype: jnp.dtype = jnp.float32,
    per_sample: bool = False,
) -> jax.Array:
    """Draw standard normal noise.

    Args:
        shape: output shape; leading dim is batch.
        key: a `jax.random.PRNGKey`. Required.
        dtype: output dtype (sampling happens in float32 then casts, which
            matches the reference's behavior of sampling at full precision).
        per_sample: if True, split the key per batch element so each sample's
            noise stream is independent of batch size — the contract the
            reference implements with a list of per-sample torch Generators.
    """
    if key is None:
        raise ValueError("randn_tensor requires an explicit PRNG key (functional RNG, no global state).")
    if per_sample and len(shape) > 0 and shape[0] > 1:
        keys = jax.random.split(key, shape[0])
        sample = jax.vmap(lambda k: jax.random.normal(k, tuple(shape[1:]), dtype=jnp.float32))(keys)
    else:
        sample = jax.random.normal(key, tuple(shape), dtype=jnp.float32)
    return sample.astype(dtype)


def to_jax(x, dtype=None):
    """numpy / torch tensor / python → jnp array (host-side, zero jit)."""
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    arr = jnp.asarray(np.asarray(x))
    if dtype is not None:
        arr = arr.astype(dtype)
    return arr


def maybe_upcast(x: jax.Array, dtype=jnp.float32) -> jax.Array:
    return x.astype(dtype) if x.dtype != dtype else x


DTYPE_MAP = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float16": jnp.float16,
    "fp16": jnp.float16,
    "float64": jnp.float64,
    "int8": jnp.int8,
    "int32": jnp.int32,
    "float8_e4m3": jnp.float8_e4m3fn,
    "float8_e5m2": jnp.float8_e5m2,
}


def resolve_dtype(dtype: Union[str, jnp.dtype, None], default=jnp.float32):
    if dtype is None:
        return default
    if isinstance(dtype, str):
        return DTYPE_MAP[dtype]
    return dtype
