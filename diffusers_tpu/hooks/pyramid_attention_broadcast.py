"""Pyramid Attention Broadcast (PAB): reuse attention outputs across denoise
steps (arXiv:2408.12588).

TPU-native counterpart of the reference hook
(`/root/reference/src/diffusers/hooks/pyramid_attention_broadcast.py:40`
PyramidAttentionBroadcastConfig; skip decision `:155-173`): the reference
wraps every attention module's forward and consults mutable per-module state.
Here the compute/reuse pattern is **host-precomputed per step index** (it
depends only on the timestep schedule), the per-layer attention-output caches
are a scan-carried pytree (stacked over blocks, so they ride the
scan-over-blocks representation for free), and each block's attention sits in
a `lax.cond` — reused steps genuinely save the attention FLOPs on device
while the MLPs still run, exactly matching the reference semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


@dataclass(frozen=True)
class PyramidAttentionBroadcastConfig:
    """Mirrors the reference surface (`pyramid_attention_broadcast.py:40`).
    `spatial_attention_block_skip_range = N` → attention recomputes every N-th
    step inside the timestep window, reusing the cache for the N−1 between."""

    spatial_attention_block_skip_range: int = 2
    spatial_attention_timestep_skip_range: Tuple[int, int] = (100, 800)
    cross_attention_block_skip_range: Optional[int] = None
    cross_attention_timestep_skip_range: Tuple[int, int] = (100, 800)


def pab_compute_mask(
    timesteps: np.ndarray,
    block_skip_range: int,
    timestep_skip_range: Tuple[int, int],
) -> np.ndarray:
    """Host-side bool[num_steps]: True where attention must be recomputed
    (reference `new_forward` gating, pyramid_attention_broadcast.py:155-163).
    Iteration counter == step index (one forward per step in our scanned
    loops; CFG runs as batch-2 inside one forward)."""
    t = np.asarray(timesteps, dtype=np.float64)
    it = np.arange(len(t))
    within = (timestep_skip_range[0] < t) & (t < timestep_skip_range[1])
    compute = (it == 0) | (~within) | (it % block_skip_range == 0)
    return compute


def pab_gate(compute, cached, fn):
    """`fn()` on compute steps, the cached pytree otherwise — one lax.cond
    per block so reused steps genuinely skip the attention FLOPs. The CFG
    streams carry INDEPENDENT caches when the pipeline runs two forwards per
    step (the reference's per-module iteration counter would alternate the
    streams instead; per-stream masks are deterministic and strictly no worse
    on quality)."""
    import jax

    return jax.lax.cond(compute, lambda _: fn(), lambda _: cached, None)
