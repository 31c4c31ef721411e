"""Fused GroupNorm(+SiLU) Pallas kernel.

Profiling the SDXL UNet shows XLA spends ~20% of the forward in
`convert_reduce_fusion` (GroupNorm statistics) plus separate normalize/SiLU
fusions. This kernel keeps the whole computation on-chip per batch element:

  phase 1: stream the [N, C] feature map from HBM in row chunks (double
           buffering via async DMA), accumulating per-channel sum / sum-of-
           squares in float32 VMEM scratch;
  group collapse: per-channel sums → per-group stats with a one-hot [C, G]
           mask matmul (MXU), broadcast back per channel the same way;
  phase 2: stream the chunks again, normalize + affine + SiLU, DMA out.

Exactly two HBM reads + one write of x; no float32 materialization of the
full map. Layout: [B, N, C] with C lane-aligned (multiple of 128).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_kernel(
    x_hbm, mask_ref, scale_ref, bias_ref, o_hbm,
    s1_ref, s2_ref, stats_ref, buf_ref, obuf_ref, in_sems, out_sems,
    *, eps: float, group_size: int, apply_silu: bool, chunk: int, n_chunks: int,
):
    C = s1_ref.shape[1]

    bi = pl.program_id(0)

    def in_dma(slot, j):
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(j * chunk, chunk), :], buf_ref.at[slot], in_sems.at[slot]
        )

    def out_dma(slot, j):
        return pltpu.make_async_copy(
            obuf_ref.at[slot], o_hbm.at[bi, pl.ds(j * chunk, chunk), :], out_sems.at[slot]
        )

    # ---------------- phase 1: statistics ----------------
    s1_ref[...] = jnp.zeros_like(s1_ref)
    s2_ref[...] = jnp.zeros_like(s2_ref)
    in_dma(0, 0).start()

    def stats_body(j, _):
        slot = j % 2
        nxt = (j + 1) % 2

        @pl.when(j + 1 < n_chunks)
        def _():
            in_dma(nxt, j + 1).start()

        in_dma(slot, j).wait()
        xf = buf_ref[slot].astype(jnp.float32)
        s1_ref[...] += jnp.sum(xf, axis=0, keepdims=True)
        s2_ref[...] += jnp.sum(xf * xf, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, n_chunks, stats_body, 0)

    # ---------------- group collapse ----------------
    mask = mask_ref[...]  # [C, G] f32
    count = n_chunks * chunk * group_size
    s1_g = jnp.dot(s1_ref[...], mask, preferred_element_type=jnp.float32)  # [1, G]
    s2_g = jnp.dot(s2_ref[...], mask, preferred_element_type=jnp.float32)
    mean_g = s1_g / count
    var_g = s2_g / count - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, mask.T, preferred_element_type=jnp.float32)  # [1, C]
    inv_c = jnp.dot(inv_g, mask.T, preferred_element_type=jnp.float32)
    scale_c = inv_c * scale_ref[...].astype(jnp.float32)
    shift_c = bias_ref[...].astype(jnp.float32) - mean_c * scale_c
    stats_ref[0:1] = scale_c
    stats_ref[1:2] = shift_c

    # ---------------- phase 2: normalize + affine (+ SiLU) ----------------
    in_dma(0, 0).start()

    def apply_body(j, _):
        slot = j % 2
        nxt = (j + 1) % 2

        @pl.when(j + 1 < n_chunks)
        def _():
            in_dma(nxt, j + 1).start()

        in_dma(slot, j).wait()

        @pl.when(j >= 2)
        def _():
            out_dma(slot, j - 2).wait()

        y = buf_ref[slot].astype(jnp.float32) * stats_ref[0:1] + stats_ref[1:2]
        if apply_silu:
            y = y * jax.nn.sigmoid(y)
        obuf_ref[slot] = y.astype(obuf_ref.dtype)
        out_dma(slot, j).start()
        return 0

    jax.lax.fori_loop(0, n_chunks, apply_body, 0)
    out_dma((n_chunks - 2) % 2, n_chunks - 2).wait()
    out_dma((n_chunks - 1) % 2, n_chunks - 1).wait()


def _pick_chunk(n: int, c: int, itemsize: int) -> int:
    """Largest row chunk with 2 in + 2 out buffers within ~8MB of VMEM."""
    budget = 8 * 1024 * 1024
    per_row = c * itemsize * 4  # 2 double-buffered in + 2 out
    chunk = max(budget // per_row, 8)
    chunk = min(chunk, n)
    while n % chunk != 0:  # need even division
        chunk -= 1
    return chunk


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "apply_silu", "interpret"))
def group_norm_silu(
    x: jax.Array,  # [B, N, C]
    scale: jax.Array,  # [C]
    bias: jax.Array,  # [C]
    num_groups: int,
    eps: float = 1e-5,
    apply_silu: bool = True,
    interpret: bool = False,
) -> jax.Array:
    b, n, c = x.shape
    g = num_groups
    group_size = c // g
    chunk = _pick_chunk(n, c, x.dtype.itemsize)
    n_chunks = n // chunk
    if n_chunks < 2:  # double-buffered pipeline assumes >= 2 chunks
        chunk = n // 2
        while chunk > 0 and n % chunk != 0:
            chunk -= 1
        n_chunks = n // chunk

    mask = jnp.asarray(np.kron(np.eye(g, dtype=np.float32), np.ones((group_size, 1), np.float32)))
    kernel = functools.partial(
        _gn_kernel, eps=eps, group_size=group_size, apply_silu=apply_silu, chunk=chunk, n_chunks=n_chunks
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((c, g), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),  # s1
            pltpu.VMEM((1, c), jnp.float32),  # s2
            pltpu.VMEM((2, c), jnp.float32),  # fused scale/shift
            pltpu.VMEM((2, chunk, c), x.dtype),  # in double buffer
            pltpu.VMEM((2, chunk, c), x.dtype),  # out double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x, mask, scale, bias)


def group_norm_silu_nhwc(x, scale, bias, num_groups, eps=1e-5, apply_silu=True, interpret=False):
    """[B, H, W, C] wrapper. Returns None (caller falls back to the jnp path)
    when the layout doesn't fit the kernel contract."""
    b, h, w, c = x.shape
    n = h * w
    if c % 128 != 0 or n % 16 != 0:
        return None
    y = group_norm_silu(x.reshape(b, n, c), scale, bias, num_groups, eps, apply_silu, interpret)
    return y.reshape(b, h, w, c)
