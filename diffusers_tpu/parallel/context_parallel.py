"""Sequence/context-parallel attention: Ring and Ulysses over a mesh axis.

TPU-native counterpart of the reference's templated CP attention
(`/root/reference/src/diffusers/models/attention_dispatch.py:2229`
TemplatedRingAttention — per-rank KV rotation with LSE online merge;
`:2359` TemplatedUlyssesAttention — all-to-all heads↔sequence scatter;
`:2664` unified = Ulysses ∘ Ring, USP arXiv:2405.07719). The reference builds
these on torch.distributed functional collectives; here they are shard_map
programs over a named mesh axis using `jax.lax.ppermute` (ring) and
`jax.lax.all_to_all` (Ulysses), riding ICI.

All functions are called INSIDE `shard_map` (or under jit with sharded inputs
via the wrappers below). Tensors are [B, S_local, H, D].
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.attention import _native_attention


def _attention_with_lse(q, k, v, scale, mask=None):
    """Blockwise attention returning (out, lse). q/k/v: [B, S, H, D].
    `mask`: optional bool, broadcastable to [B, H, Sq, Sk]; fully-masked rows
    yield out=0, lse=-inf (safe for the online merge)."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    p = jnp.exp(logits - m_safe)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
    lse = jnp.where(l <= 0.0, -jnp.inf, m_safe + jnp.log(jnp.maximum(l, 1e-30))).squeeze(-1)  # [B, H, Sq]
    # out is unnormalized-by-l; normalize here, merge uses lse
    l_safe = jnp.maximum(jnp.transpose(l, (0, 2, 1, 3)), 1e-30)
    out = out / l_safe.astype(out.dtype)
    return out, lse


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str, scale: Optional[float] = None,
                   key_mask: Optional[jax.Array] = None, is_causal: bool = False):
    """Ring attention inside shard_map: KV shards rotate around the ring; each
    step's partial output merges via the online log-sum-exp recurrence
    (reference TemplatedRingAttention fwd, attention_dispatch.py:2246-2310).

    `key_mask`: local [B, Sk_local] bool key-validity shard (text-padding
    masks) — rotated around the ring with its K/V chunk. `is_causal` builds
    the per-step chunk-vs-chunk causal block mask from the ring topology
    (the reference handles these via TemplatedRing*Anything*Attention,
    attention_dispatch.py:2460)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    my = jax.lax.axis_index(axis_name)
    sq, sk = q.shape[1], k.shape[1]

    def step(carry, t):
        out, lse, k_cur, v_cur, m_cur = carry
        mask = None
        if m_cur is not None:
            mask = m_cur[:, None, None, :]  # [B,1,1,Sk]
        if is_causal:
            # after t rotations this rank holds the chunk of rank (my - t) mod n
            src = jnp.mod(my - t, n)
            q_pos = my * sq + jnp.arange(sq)
            k_pos = src * sk + jnp.arange(sk)
            causal = (q_pos[:, None] >= k_pos[None, :])[None, None]
            mask = causal if mask is None else (mask & causal)
        o_i, lse_i = _attention_with_lse(q, k_cur, v_cur, scale, mask=mask)
        new_lse = jnp.logaddexp(lse, lse_i)
        w_old = jnp.where(jnp.isneginf(lse), 0.0, jnp.exp(lse - jnp.where(jnp.isneginf(new_lse), 0.0, new_lse)))
        w_new = jnp.where(jnp.isneginf(lse_i), 0.0, jnp.exp(lse_i - jnp.where(jnp.isneginf(new_lse), 0.0, new_lse)))
        w_old = w_old[..., None].transpose(0, 2, 1, 3)  # [B,Sq,H,1]
        w_new = w_new[..., None].transpose(0, 2, 1, 3)
        out = out * w_old.astype(out.dtype) + o_i * w_new.astype(out.dtype)
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        m_next = jax.lax.ppermute(m_cur, axis_name, perm) if m_cur is not None else None
        return (out, new_lse, k_next, v_next, m_next), None

    out0 = jnp.zeros_like(q)
    lse0 = jnp.full((q.shape[0], q.shape[2], q.shape[1]), -jnp.inf, dtype=jnp.float32)
    (out, lse, _, _, _), _ = jax.lax.scan(step, (out0, lse0, k, v, key_mask), jnp.arange(n))
    return out


def ulysses_attention(q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str, scale: Optional[float] = None,
                      key_mask: Optional[jax.Array] = None, is_causal: bool = False):
    """Ulysses/DeepSpeed-SP attention inside shard_map: all-to-all scatters
    heads and gathers sequence, full attention runs locally on full sequence
    with H/n heads, inverse all-to-all restores the layout (reference
    TemplatedUlyssesAttention, attention_dispatch.py:2359; SeqAllToAllDim `:2001`).
    `key_mask`: local [B, Sk_local] bool shard, all-gathered to the full key
    mask before the local full-sequence attention."""
    n = jax.lax.psum(1, axis_name)

    def scatter_heads(x):  # [B, S/n, H, D] -> [B, S, H/n, D]
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)

    def gather_heads(x):  # [B, S, H/n, D] -> [B, S/n, H, D]
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)

    q_full = scatter_heads(q)
    k_full = scatter_heads(k)
    v_full = scatter_heads(v)
    mask = None
    if key_mask is not None:
        full_mask = jax.lax.all_gather(key_mask, axis_name, axis=1, tiled=True)  # [B, Sk]
        mask = full_mask[:, None, None, :]
    out = _native_attention(q_full, k_full, v_full, attn_mask=mask, scale=scale, is_causal=is_causal)
    return gather_heads(out)


def unified_sp_attention(q, k, v, ring_axis: str, ulysses_axis: str, scale: Optional[float] = None):
    """Unified SP (USP): Ulysses over one axis composed with Ring over the
    other (reference _templated_unified_attention, attention_dispatch.py:2664)."""
    n = jax.lax.psum(1, ulysses_axis)

    def scatter_heads(x):
        return jax.lax.all_to_all(x, ulysses_axis, split_axis=2, concat_axis=1, tiled=True)

    def gather_heads(x):
        return jax.lax.all_to_all(x, ulysses_axis, split_axis=1, concat_axis=2, tiled=True)

    q2, k2, v2 = scatter_heads(q), scatter_heads(k), scatter_heads(v)
    out = ring_attention(q2, k2, v2, ring_axis, scale=scale)
    return gather_heads(out)


# ---------------------------------------------------------------------------
# jit-level wrappers: shard inputs over the sequence axis and run shard_map
# ---------------------------------------------------------------------------


def make_ring_attention(mesh: Mesh, axis_name: str = "sequence"):
    """Returns fn(q, k, v) with [B, S, H, D] global tensors, sequence-sharded."""
    spec = P(None, axis_name, None, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    def fn(q, k, v):
        return ring_attention(q, k, v, axis_name)

    return fn


def make_ulysses_attention(mesh: Mesh, axis_name: str = "sequence"):
    spec = P(None, axis_name, None, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    def fn(q, k, v):
        return ulysses_attention(q, k, v, axis_name)

    return fn
