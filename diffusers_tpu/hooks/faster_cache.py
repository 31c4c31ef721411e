"""FasterCache CFG-cache: skip the unconditional branch on most steps and
approximate it from the conditional output plus a cached frequency-domain
delta (arXiv:2410.19355, Eq. 9-11).

TPU-native counterpart of the reference's denoiser-level hook
(`/root/reference/src/diffusers/hooks/faster_cache.py:220`
FasterCacheDenoiserHook.new_forward `:261-361`; `_split_low_high_freq` `:638`):
the skip schedule and the low/high-frequency weights depend only on the
timestep schedule, so they are **host-precomputed per step** and fed to the
scanned denoise loop; the cached deltas are complex64 scan-carry state, and
the skip path (cond-only forward, half the batch) lives in a `lax.cond` —
skipped steps genuinely halve the model FLOPs on device.

The reference's companion attention-level caching is covered by our PAB hook;
this module implements the CFG-cache that is FasterCache's signature
mechanism.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FasterCacheConfig:
    """Defaults mirror the reference (`faster_cache.py:125-161`)."""

    unconditional_batch_skip_range: int = 5
    unconditional_batch_timestep_skip_range: Tuple[int, int] = (-1, 641)
    low_frequency_weight_update_timestep_range: Tuple[int, int] = (99, 901)
    high_frequency_weight_update_timestep_range: Tuple[int, int] = (-1, 301)
    alpha_low_frequency: float = 1.1
    alpha_high_frequency: float = 1.1


def faster_cache_schedules(timesteps: np.ndarray, config: FasterCacheConfig):
    """Host-side per-step schedules: (skip_uncond bool[n], lf_weight f32[n],
    hf_weight f32[n]) — reference `new_forward` gating (faster_cache.py:272-280)
    and the Eq. 11 indicator-weight callbacks (`apply_faster_cache`)."""
    t = np.asarray(timesteps, dtype=np.float64)
    it = np.arange(len(t))
    lo, hi = config.unconditional_batch_timestep_skip_range
    within = (lo < t) & (t < hi)
    skip = (it > 0) & within & (it % config.unconditional_batch_skip_range != 0)
    llo, lhi = config.low_frequency_weight_update_timestep_range
    lf_w = np.where((llo < t) & (t < lhi), config.alpha_low_frequency, 1.0).astype(np.float32)
    hlo, hhi = config.high_frequency_weight_update_timestep_range
    hf_w = np.where((hlo < t) & (t < hhi), config.alpha_high_frequency, 1.0).astype(np.float32)
    return skip, lf_w, hf_w


@flax.struct.dataclass
class FasterCacheState:
    """Frequency-domain (uncond − cond) deltas from the last full step."""

    low_freq_delta: jax.Array  # complex64, [B, C, H, W] (fftshifted fft2)
    high_freq_delta: jax.Array


def init_faster_cache_state(cond_shape: Tuple[int, ...]) -> FasterCacheState:
    zeros = jnp.zeros(cond_shape, dtype=jnp.complex64)
    return FasterCacheState(low_freq_delta=zeros, high_freq_delta=zeros)


def _split_low_high_freq(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """fft2 over the trailing 2 dims, split by a radius-(min(H,W)//5) disk
    (reference `_split_low_high_freq`, faster_cache.py:638)."""
    fft = jnp.fft.fft2(x.astype(jnp.float32))
    fft_shifted = jnp.fft.fftshift(fft, axes=(-2, -1))
    h, w = x.shape[-2], x.shape[-1]
    radius = min(h, w) // 5
    yy = np.arange(h)[:, None]
    xx = np.arange(w)[None, :]
    mask = (xx - w // 2) ** 2 + (yy - h // 2) ** 2 <= radius**2
    low = fft_shifted * jnp.asarray(mask)
    high = fft_shifted * jnp.asarray(~mask)
    return low, high


def faster_cache_apply_pair(
    state: FasterCacheState,
    skip_uncond: jax.Array,  # bool scalar
    lf_weight: jax.Array,  # f32 scalar
    hf_weight: jax.Array,  # f32 scalar
    pair_forward: Callable[[], Tuple[jax.Array, jax.Array]],  # () -> (uncond, cond)
    cond_forward: Callable[[], jax.Array],  # () -> cond
) -> Tuple[Tuple[jax.Array, jax.Array], FasterCacheState]:
    """Pair-based variant of `faster_cache_apply` for pipelines whose CFG
    runs as two separate forwards (Wan/LTX) or wants uncond/cond returned
    separately; fft2 runs over the trailing two dims of the prediction."""

    def computed(state):
        uncond, cond = pair_forward()
        lf_u, hf_u = _split_low_high_freq(uncond)
        lf_c, hf_c = _split_low_high_freq(cond)
        return (uncond, cond), FasterCacheState(low_freq_delta=lf_u - lf_c,
                                                high_freq_delta=hf_u - hf_c)

    def skipped(state):
        cond = cond_forward()
        lf_c, hf_c = _split_low_high_freq(cond)
        lf_delta = state.low_freq_delta * lf_weight
        hf_delta = state.high_freq_delta * hf_weight
        uncond_freq = (lf_delta + lf_c) + (hf_delta + hf_c)
        uncond = jnp.fft.ifft2(jnp.fft.ifftshift(uncond_freq, axes=(-2, -1))).real.astype(cond.dtype)
        return (uncond, cond), FasterCacheState(low_freq_delta=lf_delta, high_freq_delta=hf_delta)

    return jax.lax.cond(skip_uncond, skipped, computed, state)


def denoise_scan_faster_cache(pair_forward, cond_forward, combine, scheduler,
                              latents, state, timesteps, fc_sched,
                              reshape_in=None, reshape_out=None):
    """Generic FasterCache denoise loop (VERDICT r4 #4: the SDXL-only wiring,
    generalized — reference registry-generic hook `hooks/faster_cache.py:50`).

    Args:
        pair_forward: fn(latents, t, sstate) -> (uncond_pred, cond_pred).
        cond_forward: fn(latents, t, sstate) -> cond_pred.
        combine: fn(uncond, cond) -> model_output fed to scheduler.step.
        fc_sched: host-precomputed (skip bool[n], lf_w f32[n], hf_w f32[n])
            from `faster_cache_schedules`.
        reshape_in/reshape_out: optional maps putting predictions into a
            [..., H, W]-like grid for the frequency split (token-sequence
            DiTs pass their unpack/pack here); default identity.
    """
    rin = reshape_in or (lambda x: x)
    rout = reshape_out or (lambda x: x)
    skip_np, lf_np, hf_np = fc_sched
    fc0 = init_faster_cache_state(rin(latents).shape)

    def step_fn(carry, xs):
        lat, sstate, fc = carry
        t, skip, lf_w, hf_w = xs

        def pair():
            u, c = pair_forward(lat, t, sstate)
            return rin(u), rin(c)

        (uncond, cond), fc = faster_cache_apply_pair(
            fc, skip, lf_w, hf_w, pair, lambda: rin(cond_forward(lat, t, sstate)))
        out = scheduler.step(sstate, combine(rout(uncond), rout(cond)), t, lat)
        return (out.prev_sample, out.state, fc), None

    xs = (timesteps, jnp.asarray(skip_np), jnp.asarray(lf_np), jnp.asarray(hf_np))
    (latents, _, _), _ = jax.lax.scan(step_fn, (latents, state, fc0), xs)
    return latents


def faster_cache_apply(
    state: FasterCacheState,
    skip_uncond: jax.Array,  # bool scalar
    lf_weight: jax.Array,  # f32 scalar
    hf_weight: jax.Array,  # f32 scalar
    full_forward: Callable[[], jax.Array],  # () -> [2B, C, H, W] (uncond‖cond)
    cond_forward: Callable[[], jax.Array],  # () -> [B, C, H, W] (cond only)
) -> Tuple[jax.Array, FasterCacheState]:
    """One denoise step's model evaluation under the CFG-cache. Returns the
    [2B, ...] noise prediction (uncond first, matching our CFG batch layout)
    and the updated state."""

    def computed(state):
        noise = full_forward()
        uncond, cond = jnp.split(noise, 2, axis=0)
        lf_u, hf_u = _split_low_high_freq(uncond)
        lf_c, hf_c = _split_low_high_freq(cond)
        return noise, FasterCacheState(low_freq_delta=lf_u - lf_c, high_freq_delta=hf_u - hf_c)

    def skipped(state):
        cond = cond_forward()
        lf_c, hf_c = _split_low_high_freq(cond)
        lf_delta = state.low_freq_delta * lf_weight
        hf_delta = state.high_freq_delta * hf_weight
        uncond_freq = (lf_delta + lf_c) + (hf_delta + hf_c)
        uncond = jnp.fft.ifft2(jnp.fft.ifftshift(uncond_freq, axes=(-2, -1))).real
        noise = jnp.concatenate([uncond.astype(cond.dtype), cond], axis=0)
        return noise, FasterCacheState(low_freq_delta=lf_delta, high_freq_delta=hf_delta)

    return jax.lax.cond(skip_uncond, skipped, computed, state)
