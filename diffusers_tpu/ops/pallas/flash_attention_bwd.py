"""Pallas TPU flash attention: LSE-carrying forward + backward kernels and a
custom-VJP wrapper, with additive-mask support.

Completes the round-1 forward-only kernel (flash_attention.py): semantics
match the reference's LSE-carrying templated attention
(`/root/reference/src/diffusers/models/attention_dispatch.py:2246-2356` —
fwd returns (out, lse); bwd recomputes p from q·k and lse, then
    dv += pᵀ·dO,   ds = p ⊙ (dO·vᵀ − Δ),   dk += dsᵀ·q,   dq += ds·k
with Δ = rowsum(dO ⊙ O), the FlashAttention-2 backward).

Layouts: q/k/v [B, H, S, D] inside the kernels (BSHD at the public wrapper).
Masks are additive float biases broadcastable to [B, H, Sq, Sk]; boolean
masks are converted by the wrapper.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# bf16 softmax pipeline on the inference path (see _flash_fwd_bhsd); module
# global so the roofline harness can A/B it in one process. DEFAULT OFF:
# isolated-kernel benchmarks showed ~2x at seq 1024, but the same-process
# UNet A/B (r5, v5e) measured the COMPOSED graph 2 ms SLOWER with bf16
# softmax (125.3 vs 123.4 ms) — the end metric wins.
FLASH_SOFTMAX_BF16 = False
# LSE/delta are stored lane-replicated as [B, H, S, LANES] — Mosaic requires
# the last two block dims to tile (8, 128), so a [B, H, S] output with block
# (1, 1, block_q) is not lowerable (same layout trick as the official kernel,
# jax/experimental/pallas/ops/tpu/flash_attention.py MIN_BLOCK_SIZE).
LANES = 128


# ---------------------------------------------------------------------------
# forward (with optional LSE output + optional additive mask)
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *maybe_lse_ref, scale, block_k, is_causal,
                has_mask, softmax_dtype=jnp.float32):
    """One (batch, head, q-block) program.

    Matmuls run in the INPUT dtype with f32 accumulation (bf16 x bf16 -> f32
    is the MXU's native full-rate mode; the old f32-upcast dots quartered
    throughput). `softmax_dtype` controls the max/exp/scale pipeline: bf16
    halves the VPU softmax cost, which dominates at head_dim 64 — measured
    (v5e, r5 A/B) ~2x at seq 1024 with cosine 0.99995+ vs f32; the LSE-
    carrying training path keeps f32 (see `_flash_fwd_bhsd`)."""
    q = q_ref[0, 0]  # [BQ, D] input dtype
    bq = q.shape[0]
    seq_k = k_ref.shape[2]
    num_kv = seq_k // block_k
    qi = pl.program_id(2)
    sd = softmax_dtype
    neg_inf = jnp.asarray(NEG_INF, sd)

    def body(j, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s * scale
        if has_mask:
            s = s + mask_ref[0, 0, :, pl.ds(j * block_k, block_k)].astype(jnp.float32)
        if is_causal:
            row = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
            col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            s = jnp.where(row >= col, s, NEG_INF)
        s = s.astype(sd)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l_prev * corr.astype(jnp.float32) + jnp.sum(p, axis=-1).astype(jnp.float32)
        acc = acc * corr.astype(jnp.float32)[:, None] + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq,), neg_inf, dtype=sd)
    l0 = jnp.zeros((bq,), dtype=jnp.float32)
    acc0 = jnp.zeros((bq, q_ref.shape[-1]), dtype=jnp.float32)
    if is_causal:
        num_participating = jnp.minimum((qi + 1) * bq + block_k - 1, seq_k) // block_k
        m, l, acc = jax.lax.fori_loop(0, num_participating, body, (m0, l0, acc0))
    else:
        m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))

    o_ref[0, 0] = (acc / l[:, None]).astype(o_ref.dtype)
    if maybe_lse_ref:
        lse = (m.astype(jnp.float32) + jnp.log(l)).astype(jnp.float32)
        maybe_lse_ref[0][0, 0] = jnp.broadcast_to(lse[:, None], (bq, LANES))


@functools.partial(
    jax.jit, static_argnames=("scale", "is_causal", "block_q", "block_k", "interpret", "need_lse")
)
def _flash_fwd_bhsd(q, k, v, mask, scale, is_causal, block_q, block_k, interpret, need_lse=True):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    grid = (b, h, sq // block_q)
    has_mask = mask is not None
    # inference path on bf16 inputs runs the softmax pipeline in bf16 (2x VPU
    # rate, cosine 0.99995+ vs f32 — measured r5); the LSE-carrying training
    # path stays f32 so `p = exp(s - lse)` recomputes exactly in the backward.
    # FLASH_SOFTMAX_BF16 exists for A/B measurement (profiles/profile_roofline.py).
    softmax_dtype = (
        jnp.bfloat16 if (FLASH_SOFTMAX_BF16 and not need_lse and q.dtype == jnp.bfloat16)
        else jnp.float32
    )
    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_k=block_k, is_causal=is_causal, has_mask=has_mask,
        softmax_dtype=softmax_dtype,
    )
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
        pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
    ]
    args = [q, k, v]
    if has_mask:
        in_specs.append(pl.BlockSpec((1, 1, block_q, sk), lambda bi, hi, qi: (bi, hi, qi, 0)))
        args.append(mask)
    else:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # placeholder, unused
        args.append(jnp.zeros((1,), jnp.float32))

    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0))]
    if need_lse:
        out_shape.append(jax.ShapeDtypeStruct((b, h, sq, LANES), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, block_q, LANES), lambda bi, hi, qi: (bi, hi, qi, 0)))

    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(*args)
    if need_lse:
        out, lse = outs
        return out, lse[..., 0]
    return outs[0] if isinstance(outs, (tuple, list)) else outs, None


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dkdv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref,
                     dk_ref, dv_ref, *, scale, block_q, is_causal, has_mask):
    k_blk = k_ref[0, 0].astype(jnp.float32)  # [BK, D]
    v_blk = v_ref[0, 0].astype(jnp.float32)
    bk = k_blk.shape[0]
    seq_q = q_ref.shape[2]
    ki = pl.program_id(2)

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q), :][:, :1]  # [BQ, 1] (lane-replicated)
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q), :][:, :1]
        s = jax.lax.dot_general(q * scale, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if has_mask:
            s = s + mask_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        if is_causal:
            row = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 0)
            col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 1)
            s = jnp.where(row >= col, s, NEG_INF)
        p = jnp.exp(s - lse)  # [BQ, BK]
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros_like(k_blk)
    dv0 = jnp.zeros_like(v_blk)
    if is_causal:
        # only q blocks with row_end >= col_start participate
        start = (ki * bk) // block_q
        dk, dv = jax.lax.fori_loop(start, seq_q // block_q, body, (dk0, dv0))
    else:
        dk, dv = jax.lax.fori_loop(0, seq_q // block_q, body, (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, mask_ref,
                   dq_ref, *, scale, block_k, is_causal, has_mask):
    q = q_ref[0, 0].astype(jnp.float32)  # [BQ, D]
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, :1]  # [BQ, 1] (lane-replicated)
    delta = delta_ref[0, 0][:, :1]
    bq = q.shape[0]
    seq_k = k_ref.shape[2]
    qi = pl.program_id(2)

    def body(j, dq):
        k_blk = k_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q * scale, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if has_mask:
            s = s + mask_ref[0, 0, :, pl.ds(j * block_k, block_k)].astype(jnp.float32)
        if is_causal:
            row = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
            col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            s = jnp.where(row >= col, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        return dq + jax.lax.dot_general(ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    dq0 = jnp.zeros_like(q)
    if is_causal:
        num_participating = jnp.minimum((qi + 1) * bq + block_k - 1, seq_k) // block_k
        dq = jax.lax.fori_loop(0, num_participating, body, dq0)
    else:
        dq = jax.lax.fori_loop(0, seq_k // block_k, body, dq0)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _mask_spec_and_arg(mask, sq, sk, block, axis_q):
    if mask is not None:
        if axis_q:
            return pl.BlockSpec((1, 1, block, sk), lambda bi, hi, i: (bi, hi, i, 0)), mask
        return pl.BlockSpec((1, 1, sq, block), lambda bi, hi, i: (bi, hi, 0, i)), mask
    return pl.BlockSpec(memory_space=pltpu.SMEM), jnp.zeros((1,), jnp.float32)


@functools.partial(jax.jit, static_argnames=("scale", "is_causal", "block_q", "block_k", "interpret"))
def _flash_bwd_bhsd(q, k, v, mask, out, lse, do, scale, is_causal, block_q, block_k, interpret):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # [B, H, Sq]
    # lane-replicate LSE/delta so their blocks tile the (8, 128) Mosaic layout
    lse = jnp.broadcast_to(lse[..., None], (b, h, sq, LANES))
    delta = jnp.broadcast_to(delta[..., None], (b, h, sq, LANES))
    has_mask = mask is not None

    # dK/dV: grid over kv blocks
    mask_spec_kv, mask_arg = _mask_spec_and_arg(mask, sq, block_k, block_k, axis_q=False)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, scale=scale, block_q=block_q, is_causal=is_causal, has_mask=has_mask),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(b, h, sk // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, sq, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, sq, d), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, sq, LANES), lambda bi, hi, ki: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, sq, LANES), lambda bi, hi, ki: (bi, hi, 0, 0)),
            mask_spec_kv,
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta, mask_arg)

    # dQ: grid over q blocks
    mask_spec_q, mask_arg = _mask_spec_and_arg(mask, block_q, sk, block_q, axis_q=True)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=block_k, is_causal=is_causal, has_mask=has_mask),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, LANES), lambda bi, hi, qi: (bi, hi, qi, 0)),
            mask_spec_q,
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta, mask_arg)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public wrapper: BSHD, custom VJP, shape guards
# ---------------------------------------------------------------------------


def _prep(query, key, value, attn_mask, block_q, block_k):
    """BSHD → BHSD; normalize mask to an additive [B, H|1, Sq, Sk] float bias.

    head_dim stays UNPADDED: Mosaic lowers d=64 blocks directly (verified on
    v5e, r5) — the old explicit zero-pad to 128 lanes doubled q/k/v/o HBM
    traffic for SD/SDXL's d=64 heads without changing MXU time."""
    b, s, h, d = query.shape
    sk = key.shape[1]
    pad = 0
    q = jnp.transpose(query, (0, 2, 1, 3))
    k = jnp.transpose(key, (0, 2, 1, 3))
    v = jnp.transpose(value, (0, 2, 1, 3))
    mask = None
    if attn_mask is not None:
        if attn_mask.dtype == jnp.bool_:
            attn_mask = jnp.where(attn_mask, 0.0, NEG_INF).astype(jnp.float32)
        mask = jnp.broadcast_to(attn_mask.astype(jnp.float32), (b, h, s, sk))
    return q, k, v, mask, pad


def _fit_block(seq: int, preferred: int) -> Optional[int]:
    """Largest MXU-friendly block <= preferred that divides seq. Sequences
    like Flux's 4608 (512 text + 4096 image) don't divide 1024 — requiring
    exact division of the *preferred* block silently forfeited the kernel."""
    for cand in (preferred, 1024, 512, 256, 128):
        if cand <= preferred and cand <= seq and seq % cand == 0:
            return cand
    return None


def _supported(query, key, block_q, block_k):
    b, s, h, d = query.shape
    sk = key.shape[1]
    return (
        _fit_block(s, block_q) is not None
        and _fit_block(sk, block_k) is not None
        and d % 64 == 0
        and s % 128 == 0
        and sk % 128 == 0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def flash_attention_vjp(query, key, value, attn_mask, scale, is_causal, block_q, block_k, interpret):
    out, _ = _flash_attention_fwd_impl(
        query, key, value, attn_mask, scale, is_causal, block_q, block_k, interpret, need_lse=False
    )
    return out


def _flash_attention_fwd_impl(query, key, value, attn_mask, scale, is_causal, block_q, block_k, interpret, need_lse=True):
    b, s, h, d = query.shape
    q, k, v, mask, pad = _prep(query, key, value, attn_mask, block_q, block_k)
    bq = _fit_block(s, block_q) or min(block_q, s)
    bk = _fit_block(key.shape[1], block_k) or min(block_k, key.shape[1])
    out, lse = _flash_fwd_bhsd(q, k, v, mask, scale=scale, is_causal=is_causal,
                               block_q=bq, block_k=bk, interpret=interpret, need_lse=need_lse)
    out_bshd = jnp.transpose(out, (0, 2, 1, 3))
    if pad:
        out_bshd = out_bshd[..., :d]
    return out_bshd, lse


def _vjp_fwd(query, key, value, attn_mask, scale, is_causal, block_q, block_k, interpret):
    out, lse = _flash_attention_fwd_impl(query, key, value, attn_mask, scale, is_causal, block_q, block_k, interpret)
    return out, (query, key, value, attn_mask, out, lse)


def _vjp_bwd(scale, is_causal, block_q, block_k, interpret, residuals, g):
    query, key, value, attn_mask, out, lse = residuals
    b, s, h, d = query.shape
    q, k, v, mask, pad = _prep(query, key, value, attn_mask, block_q, block_k)
    if pad:
        out = jnp.pad(out, [(0, 0), (0, 0), (0, 0), (0, pad)])
        g = jnp.pad(g, [(0, 0), (0, 0), (0, 0), (0, pad)])
    out_bhsd = jnp.transpose(out, (0, 2, 1, 3))
    do = jnp.transpose(g, (0, 2, 1, 3))
    bq = _fit_block(s, block_q) or min(block_q, s)
    bk = _fit_block(key.shape[1], block_k) or min(block_k, key.shape[1])
    dq, dk, dv = _flash_bwd_bhsd(q, k, v, mask, out_bhsd, lse, do, scale=scale,
                                 is_causal=is_causal, block_q=bq, block_k=bk, interpret=interpret)
    dq = jnp.transpose(dq, (0, 2, 1, 3))
    dk = jnp.transpose(dk, (0, 2, 1, 3))
    dv = jnp.transpose(dv, (0, 2, 1, 3))
    if pad:
        dq, dk, dv = dq[..., :d], dk[..., :d], dv[..., :d]
    return dq, dk, dv, None


flash_attention_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def flash_attention_full(
    query: jax.Array,  # [B, S, H, D]
    key: jax.Array,
    value: jax.Array,
    attn_mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    is_causal: bool = False,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Differentiable, mask-supporting flash attention (BSHD). Falls back to
    the native einsum path when shapes don't tile."""
    d = query.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    if interpret is None:
        platform = jax.devices()[0].platform
        interpret = not platform.startswith(("tpu", "axon"))
    if not _supported(query, key, block_q, block_k):
        from ..attention import _native_attention

        return _native_attention(query, key, value, attn_mask=attn_mask, scale=scale, is_causal=is_causal)
    bq = _fit_block(query.shape[1], block_q)
    bk = _fit_block(key.shape[1], block_k)
    return flash_attention_vjp(query, key, value, attn_mask, scale, is_causal, bq, bk, interpret)
