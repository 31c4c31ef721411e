"""Attention kernel dispatch.

TPU-native counterpart of the reference's backend registry
(`/root/reference/src/diffusers/models/attention_dispatch.py:224` enum, `:267`
registry, `:395` dispatch_attention_fn). The reference routes to external CUDA
kernels (flash-attn/cuDNN/Sage/xFormers); here the backends are:

  * ``native``       — jnp einsum + softmax; XLA fuses this well for short seqs
                       and it is the numerics reference for tests.
  * ``pallas_flash`` — our Pallas flash-attention kernel (ops/pallas/flash_attention.py),
                       tiled online-softmax on the MXU.
  * ``ring``/``ulysses`` — sequence-parallel wrappers (parallel/context_parallel.py),
                       selected automatically under a sharded mesh.

Tensor convention: q/k/v are [batch, seq, heads, head_dim] (BSHD — the
TPU-friendly layout with head_dim on the minor axis).
"""

from __future__ import annotations

import functools
import math
from contextlib import contextmanager
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..utils import logging

logger = logging.get_logger(__name__)

_BACKENDS: Dict[str, Callable] = {}
_active_backend: Optional[str] = None


def register_attention_backend(name: str):
    def deco(fn):
        _BACKENDS[name] = fn
        return fn

    return deco


@contextmanager
def attention_backend(name: str):
    """Context manager mirroring the reference's `attention_backend()`
    (`attention_dispatch.py:375`)."""
    global _active_backend
    if name not in _BACKENDS:
        raise ValueError(f"unknown attention backend {name!r}; available: {list(_BACKENDS)}")
    prev = _active_backend
    _active_backend = name
    try:
        yield
    finally:
        _active_backend = prev


def available_attention_backends():
    return list(_BACKENDS)


@register_attention_backend("native")
def _native_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    attn_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    is_causal: bool = False,
) -> jax.Array:
    """Reference-math attention: fp32 softmax accumulation (matches torch SDPA
    numerics). q/k/v: [B, S, H, D]."""
    b, sq, h, d = query.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    # [B, H, Sq, Sk]
    logits = jnp.einsum("bqhd,bkhd->bhqk", query, key, preferred_element_type=jnp.float32)
    logits = logits * scale
    if is_causal:
        sk = key.shape[1]
        causal = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)
        logits = jnp.where(causal, logits, jnp.finfo(jnp.float32).min)
    if attn_mask is not None:
        if attn_mask.dtype == jnp.bool_:
            logits = jnp.where(attn_mask, logits, jnp.finfo(jnp.float32).min)
        else:
            logits = logits + attn_mask.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(query.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, value)


@register_attention_backend("pallas_flash")
def _pallas_flash_attention(query, key, value, attn_mask=None, scale=None, is_causal=False):
    from .pallas.flash_attention import flash_attention

    if attn_mask is not None:
        # masked paths fall back to native until the kernel grows mask support
        return _native_attention(query, key, value, attn_mask=attn_mask, scale=scale, is_causal=is_causal)
    return flash_attention(query, key, value, scale=scale, is_causal=is_causal)


def dispatch_attention_fn(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    attn_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    is_causal: bool = False,
    backend: Optional[str] = None,
) -> jax.Array:
    """Route an attention call to the active backend.

    Selection order: explicit `backend` arg → ambient `attention_backend()`
    context → automatic (pallas_flash on TPU for long seqs, else native).
    """
    name = backend or _active_backend
    if name is None:
        name = _auto_backend(query)
    return _BACKENDS[name](query, key, value, attn_mask=attn_mask, scale=scale, is_causal=is_causal)


@functools.lru_cache()
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.startswith(("tpu", "axon"))
    except Exception:
        return False


def _auto_backend(query: jax.Array) -> str:
    # Pallas flash attention wins when the sequence is long enough to tile;
    # head_dim must be 64-aligned (64 is zero-padded to the 128 lane width
    # inside the kernel). Mirrors the reference's seq>=4096 XLA gate
    # (attention_processor.py:2790) but with TPU-tuned thresholds.
    b, s, h, d = query.shape
    if _on_tpu() and s >= 1024 and d % 64 == 0 and s % 128 == 0:
        return "pallas_flash"
    return "native"
