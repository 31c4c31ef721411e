"""TaylorSeer cache: Taylor-series extrapolation of the transformer output
across denoise steps, as explicit scan-carry state.

TPU-native counterpart of the reference hook
(`/root/reference/src/diffusers/hooks/taylorseer_cache.py:40`
TaylorSeerCacheConfig; state update/predict `:130-196`; step gating
`_measure_should_compute` `:225-234`; paper arXiv:2503.06923). The reference
wraps module forwards and mutates Python state per call; here the
whole-model output is the cached quantity (the reference's `use_lite_mode`
granularity: skip blocks, cache the projection), the Taylor factors are a
scan-carried pytree, and the compute/predict decision is **host-precomputed
per step index** (it depends only on the schedule), so skipped steps compile
to a cheap Taylor evaluation inside `lax.cond` — the full forward's FLOPs are
genuinely saved on device.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class TaylorSeerCacheConfig:
    """Mirrors the reference config surface (`taylorseer_cache.py:40`):
    full forwards every `cache_interval` steps (predictions in between),
    no caching before `disable_cache_before_step` or at/after
    `disable_cache_after_step`, Taylor expansion up to `max_order`."""

    cache_interval: int = 5
    disable_cache_before_step: int = 3
    disable_cache_after_step: Optional[int] = None
    max_order: int = 1


def taylorseer_compute_mask(num_steps: int, config: TaylorSeerCacheConfig) -> np.ndarray:
    """Host-side: bool[num_steps], True where the model runs a full forward
    (reference `_measure_should_compute`, taylorseer_cache.py:225-234)."""
    steps = np.arange(num_steps)
    warmup = steps < config.disable_cache_before_step
    interval = (steps - config.disable_cache_before_step - 1) % config.cache_interval == 0
    cooldown = (
        steps >= config.disable_cache_after_step
        if config.disable_cache_after_step is not None
        else np.zeros(num_steps, dtype=bool)
    )
    return warmup | interval | cooldown


@flax.struct.dataclass
class TaylorSeerState:
    """factors[j] ≈ j-th divided difference of the model output (factors[0] is
    the output itself); valid orders grow as updates accumulate."""

    factors: jax.Array  # [max_order+1, *out_shape]
    last_update_step: jax.Array  # int32 scalar
    n_updates: jax.Array  # int32 scalar


def init_taylorseer_state(out_shape: Tuple[int, ...], max_order: int = 1, dtype=jnp.float32) -> TaylorSeerState:
    return TaylorSeerState(
        factors=jnp.zeros((max_order + 1, *out_shape), dtype=dtype),
        last_update_step=jnp.asarray(0, jnp.int32),
        n_updates=jnp.asarray(0, jnp.int32),
    )


def taylorseer_apply(
    state: TaylorSeerState,
    step_idx: jax.Array,  # int32 scalar — current denoise step index
    should_compute: jax.Array,  # bool scalar (from taylorseer_compute_mask)
    model_fn: Callable[[], jax.Array],
) -> Tuple[jax.Array, TaylorSeerState]:
    """Run the model (and update divided-difference factors) or predict via
    Taylor expansion. Both branches trace once; one executes per step."""
    max_order = state.factors.shape[0] - 1

    def full(state: TaylorSeerState):
        y = model_fn()
        delta = (step_idx - state.last_update_step).astype(state.factors.dtype)
        delta = jnp.where(state.n_updates > 0, delta, 1.0)  # first update: no differences yet
        new = [y.astype(state.factors.dtype)]
        for j in range(max_order):
            # divided difference valid only once order-j factors existed before
            f = (new[j] - state.factors[j]) / delta
            new.append(jnp.where(state.n_updates > j, f, jnp.zeros_like(f)))
        return y, TaylorSeerState(
            factors=jnp.stack(new),
            last_update_step=step_idx.astype(jnp.int32),
            n_updates=state.n_updates + 1,
        )

    def predict(state: TaylorSeerState):
        offset = (step_idx - state.last_update_step).astype(state.factors.dtype)
        out = jnp.zeros_like(state.factors[0])
        for order in range(max_order + 1):
            coeff = offset**order / math.factorial(order)
            valid = state.n_updates > order  # factor j needs j+1 past updates
            out = out + jnp.where(valid, coeff, 0.0) * state.factors[order]
        return out, state

    return jax.lax.cond(should_compute, full, predict, state)
