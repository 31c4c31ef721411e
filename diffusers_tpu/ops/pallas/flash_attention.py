"""Pallas TPU flash attention (tiled online-softmax).

This is our native replacement for the external CUDA kernels behind the
reference's attention dispatch (flash-attn/cuDNN/xFormers,
`/root/reference/src/diffusers/models/attention_dispatch.py:224-395`), built
for the MXU: q-block × kv-block matmuls in float32 accumulation with the
running-max/denominator (online softmax) recurrence held in VMEM.

Layout contract: q/k/v are [batch, seq, heads, head_dim]; head_dim must be a
multiple of 128 (lane width) and seq a multiple of the block size. The
dispatcher guards these and falls back to the native einsum path otherwise.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int, is_causal: bool, q_block: int):
    """One (batch, head, q-block) program: stream kv blocks with online softmax.

    Matmuls run in the input dtype (bf16 x bf16 -> f32 accumulate is the MXU's
    full-rate mode); the softmax max/exp pipeline runs in bf16 for bf16 inputs
    (2x VPU rate, cosine 0.99995+ vs f32 — measured r5 on v5e)."""
    q = q_ref[0, 0]  # [BQ, D] input dtype
    bq = q.shape[0]
    seq_k = k_ref.shape[2]
    num_kv = seq_k // block_k
    qi = pl.program_id(2)
    # f32 softmax: the bf16 pipeline measured FASTER in isolation but 2 ms
    # slower on the composed SDXL UNet (r5 same-process A/B) — see
    # flash_attention_bwd.FLASH_SOFTMAX_BF16
    sd = jnp.float32

    def body(j, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, 0, pl.ds(j * block_k, block_k), :]  # [BK, D]
        v_blk = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k_blk, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [BQ, BK]
        if is_causal:
            row = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
            col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            s = jnp.where(row >= col, s, NEG_INF)
        s = s.astype(sd)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        correction = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])  # [BQ, BK]
        l_new = l_prev * correction.astype(jnp.float32) + jnp.sum(p, axis=-1).astype(jnp.float32)
        acc = acc * correction.astype(jnp.float32)[:, None] + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq,), jnp.asarray(NEG_INF, sd), dtype=sd)
    l0 = jnp.zeros((bq,), dtype=jnp.float32)
    acc0 = jnp.zeros((bq, q_ref.shape[-1]), dtype=jnp.float32)

    if is_causal:
        # only blocks with col_start <= row_end participate
        num_participating = jnp.minimum((qi + 1) * bq + block_k - 1, seq_k) // block_k
        m, l, acc = jax.lax.fori_loop(0, num_participating, body, (m0, l0, acc0))
    else:
        m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))

    o_ref[0, 0] = (acc / l[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "is_causal", "block_q", "block_k", "interpret"))
def _flash_attention_bhsd(
    q: jax.Array,  # [B, H, S, D]
    k: jax.Array,
    v: jax.Array,
    scale: float,
    is_causal: bool = False,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    grid = (b, h, sq // block_q)

    kernel = functools.partial(
        _flash_kernel, scale=scale, block_k=block_k, is_causal=is_causal, q_block=block_q
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, sk, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret,
    )(q, k, v)


def flash_attention(
    query: jax.Array,  # [B, S, H, D]
    key: jax.Array,
    value: jax.Array,
    scale: Optional[float] = None,
    is_causal: bool = False,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """BSHD-convention flash attention with shape guards + fallback."""
    b, s, h, d = query.shape
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu",) and not jax.devices()[0].platform.startswith("axon")

    bq = min(block_q, s)
    bk = min(block_k, key.shape[1])
    if s % bq != 0 or key.shape[1] % bk != 0 or d % 64 != 0 or s % 128 != 0 or key.shape[1] % 128 != 0:
        from ..attention import _native_attention

        return _native_attention(query, key, value, scale=scale, is_causal=is_causal)

    # head_dim stays UNPADDED (d=64 lowers directly on v5e; explicit zero-pad
    # to 128 lanes doubled q/k/v/o HBM traffic for no MXU gain — r5 measurement)
    q = jnp.transpose(query, (0, 2, 1, 3))
    k = jnp.transpose(key, (0, 2, 1, 3))
    v = jnp.transpose(value, (0, 2, 1, 3))
    out = _flash_attention_bhsd(q, k, v, scale=scale, is_causal=is_causal, block_q=bq, block_k=bk, interpret=interpret)
    return jnp.transpose(out, (0, 2, 1, 3))
