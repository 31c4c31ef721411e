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
    """Differentiable LSE-carrying flash kernel with additive-mask support
    (ops/pallas/flash_attention_bwd.py); falls back to native internally when
    shapes don't tile."""
    from .pallas.flash_attention_bwd import flash_attention_full

    return flash_attention_full(query, key, value, attn_mask=attn_mask, scale=scale, is_causal=is_causal)


@register_attention_backend("ring")
def _ring_attention_backend(query, key, value, attn_mask=None, scale=None, is_causal=False):
    """Sequence-parallel ring attention over the ambient mesh's sequence axis
    (reference TemplatedRingAttention, attention_dispatch.py:2229). Requires an
    active ParallelEnv (pipeline.enable_parallelism); sequences that don't
    divide the sequence axis are padded + key-masked + trimmed (reference
    TemplatedRingAnythingAttention, attention_dispatch.py:2460); falls back to
    native only when no env is set or a general dense mask is given."""
    env = _get_env()
    if env is not None and env.sequence_degree > 1:
        padded = _pad_for_cp(query, key, value, attn_mask, env, need_head_split=False)
        if padded is not None:
            q2, k2, v2, mask2, sq = padded
            out = _ring_attention_backend(q2, k2, v2, attn_mask=mask2, scale=scale, is_causal=is_causal)
            return out[:, :sq]
    if not _cp_applicable(env, query, key, attn_mask, is_causal, need_head_split=False):
        return _native_attention(query, key, value, attn_mask=attn_mask, scale=scale, is_causal=is_causal)
    from ..parallel.context_parallel import ring_attention
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, env.sequence_axis, None, None)
    key_mask = _as_key_mask(attn_mask, query.shape[0], key.shape[1])
    if key_mask is not None:
        fn = shard_map(
            lambda q, k, v, m: ring_attention(
                q, k, v, axis_name=env.sequence_axis, scale=scale, key_mask=m, is_causal=is_causal),
            mesh=env.mesh,
            in_specs=(spec, spec, spec, P(None, env.sequence_axis)),
            out_specs=spec,
            check_vma=False,
        )
        return fn(query, key, value, key_mask)
    fn = shard_map(
        functools.partial(ring_attention, axis_name=env.sequence_axis, scale=scale, is_causal=is_causal),
        mesh=env.mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(query, key, value)


@register_attention_backend("ulysses")
def _ulysses_attention_backend(query, key, value, attn_mask=None, scale=None, is_causal=False):
    """Sequence-parallel Ulysses attention (all-to-all heads↔seq scatter) over
    the ambient mesh's sequence axis (reference TemplatedUlyssesAttention,
    attention_dispatch.py:2359). Non-dividing sequences are padded + trimmed
    (reference TemplatedUlyssesAnythingAttention, attention_dispatch.py:2573)."""
    env = _get_env()
    if env is not None and env.sequence_degree > 1:
        padded = _pad_for_cp(query, key, value, attn_mask, env, need_head_split=True)
        if padded is not None:
            q2, k2, v2, mask2, sq = padded
            out = _ulysses_attention_backend(q2, k2, v2, attn_mask=mask2, scale=scale, is_causal=is_causal)
            return out[:, :sq]
    if not _cp_applicable(env, query, key, attn_mask, is_causal, need_head_split=True):
        return _native_attention(query, key, value, attn_mask=attn_mask, scale=scale, is_causal=is_causal)
    from ..parallel.context_parallel import ulysses_attention
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, env.sequence_axis, None, None)
    key_mask = _as_key_mask(attn_mask, query.shape[0], key.shape[1])
    if key_mask is not None:
        fn = shard_map(
            lambda q, k, v, m: ulysses_attention(
                q, k, v, axis_name=env.sequence_axis, scale=scale, key_mask=m, is_causal=is_causal),
            mesh=env.mesh,
            in_specs=(spec, spec, spec, P(None, env.sequence_axis)),
            out_specs=spec,
            check_vma=False,
        )
        return fn(query, key, value, key_mask)
    fn = shard_map(
        functools.partial(ulysses_attention, axis_name=env.sequence_axis, scale=scale, is_causal=is_causal),
        mesh=env.mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(query, key, value)


def _get_env():
    from ..parallel.env import get_parallel_env

    return get_parallel_env()


def _as_key_mask(attn_mask, batch: int, sk: int):
    """Canonicalize an attention mask to a per-key validity mask [B, Sk] when
    possible (the common text-padding case: bool masks shaped [B, Sk],
    [B, 1, Sk], or [B, 1, 1, Sk]); returns None otherwise."""
    if attn_mask is None or attn_mask.dtype != jnp.bool_:
        return None
    shape = attn_mask.shape
    if shape[-1] != sk:
        return None
    if len(shape) == 2 and shape[0] in (1, batch):
        km = attn_mask
    elif len(shape) in (3, 4) and all(dim == 1 for dim in shape[1:-1]) and shape[0] in (1, batch):
        km = attn_mask.reshape(shape[0], sk)
    else:
        return None
    return jnp.broadcast_to(km, (batch, sk))


def _cp_applicable(env, query, key, attn_mask, is_causal, need_head_split: bool,
                   allow_uneven: bool = False) -> bool:
    """Can this call run sequence-parallel? Both q and kv sequences must tile
    evenly over the sequence axis (with `allow_uneven`, non-dividing lengths
    count as shardable — the backends pad + key-mask + trim, reference
    TemplatedRingAnythingAttention, attention_dispatch.py:2460). Key-validity
    (text-padding) masks and causal attention shard fine; only general dense
    masks fall back."""
    if env is None or env.sequence_degree <= 1:
        return False
    if attn_mask is not None and _as_key_mask(attn_mask, query.shape[0], key.shape[1]) is None:
        return False
    n = env.sequence_degree
    b, s, h, d = query.shape
    if not allow_uneven and (s % n != 0 or key.shape[1] % n != 0):
        return False
    if need_head_split and h % n != 0:
        return False
    return True


_warned_cp_padding = False


def _pad_for_cp(query, key, value, attn_mask, env, need_head_split: bool):
    """Pad q/kv to the next sequence-axis multiple with an all-False key mask
    over the padding; returns (q, k, v, key_mask, orig_sq) or None when no
    padding is needed / the call can't shard anyway."""
    n = env.sequence_degree
    b, sq, h, d = query.shape
    sk = key.shape[1]
    pad_q = (-sq) % n
    pad_k = (-sk) % n
    if pad_q == 0 and pad_k == 0:
        return None
    if need_head_split and h % n != 0:
        return None
    key_mask = _as_key_mask(attn_mask, b, sk)
    if attn_mask is not None and key_mask is None:
        return None  # general dense mask: can't shard at all
    global _warned_cp_padding
    if not _warned_cp_padding:
        logger.warning(
            f"sequence-parallel attention: seq lengths (q={sq}, kv={sk}) don't divide "
            f"sequence_degree={n}; padding to the next multiple and trimming (one-time notice)."
        )
        _warned_cp_padding = True
    q2 = jnp.pad(query, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
    k2 = jnp.pad(key, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    v2 = jnp.pad(value, ((0, 0), (0, pad_k), (0, 0), (0, 0)))
    if key_mask is None:
        key_mask = jnp.ones((b, sk), dtype=jnp.bool_)
    mask2 = jnp.pad(key_mask, ((0, 0), (0, pad_k)), constant_values=False)
    return q2, k2, v2, mask2, sq


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
    context → sequence-parallel ring/ulysses when a ParallelEnv with
    sequence_degree > 1 is active → automatic (pallas_flash on TPU for long
    seqs, else native).
    """
    from ..utils.constants import DIFFUSERS_TPU_ATTN_BACKEND, DIFFUSERS_TPU_ATTN_CHECKS

    if DIFFUSERS_TPU_ATTN_CHECKS:
        if not (query.ndim == key.ndim == value.ndim == 4):
            raise ValueError(
                f"attention expects [B,S,H,D] tensors, got q{query.shape} k{key.shape} v{value.shape}"
            )
        if query.shape[-1] != key.shape[-1] or key.shape[:2] != value.shape[:2]:
            raise ValueError(f"inconsistent attention shapes q{query.shape} k{key.shape} v{value.shape}")
    name = backend or _active_backend or DIFFUSERS_TPU_ATTN_BACKEND
    if name is None:
        name = _auto_backend(query, key, attn_mask, is_causal)
    return _BACKENDS[name](query, key, value, attn_mask=attn_mask, scale=scale, is_causal=is_causal)


@functools.lru_cache()
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.startswith(("tpu", "axon"))
    except Exception:
        return False


def _auto_backend(query: jax.Array, key: jax.Array, attn_mask=None, is_causal: bool = False) -> str:
    # Sequence-parallel first: an active ParallelEnv with sequence_degree > 1
    # routes self-attention through ulysses (heads divide) or ring.
    env = _get_env()
    if _cp_applicable(env, query, key, attn_mask, is_causal, need_head_split=False, allow_uneven=True):
        if env.cp_backend is not None:
            return env.cp_backend
        n = env.sequence_degree
        return "ulysses" if query.shape[2] % n == 0 else "ring"
    # Pallas flash attention wins when the sequence is long enough to tile;
    # head_dim must be 64-aligned (64 is zero-padded to the 128 lane width
    # inside the kernel). Mirrors the reference's seq>=4096 XLA gate
    # (attention_processor.py:2790) but with TPU-tuned thresholds.
    b, s, h, d = query.shape
    # d <= 256: larger head dims (e.g. VAE mid-block single-head attention,
    # d=512 at 16k tokens) blow the kernel's per-block VMEM budget — measured
    # scoped-vmem OOM on v5e; XLA's native path handles those fine.
    if _on_tpu() and s >= 1024 and d % 64 == 0 and d <= 256 and s % 128 == 0:
        return "pallas_flash"
    return "native"
