"""FreeInit (arXiv:2312.07537): iterative noise reinitialization for video
generation — between sampling iterations, keep the low spatio-temporal
frequencies of the (re-noised) result and replace the high frequencies with
fresh noise.

Counterpart of the reference `pipelines/free_init_utils.py` (FreeInitMixin:
`_get_free_init_freq_filter` `:73`, `_apply_freq_filter` `:117`,
`_apply_free_init` `:135`). The filter construction is vectorized (the
reference triple-loops per voxel) and the mixin drives any video pipeline
whose denoise loop is re-entrant, the natural fit for our jitted loops."""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.jax_utils import randn_tensor


@dataclass(frozen=True)
class FreeInitConfig:
    """Reference enable_free_init args (free_init_utils.py:27-66)."""

    num_iters: int = 3
    use_fast_sampling: bool = False
    method: str = "butterworth"  # "butterworth" | "gaussian" | "ideal"
    order: int = 4
    spatial_stop_frequency: float = 0.25
    temporal_stop_frequency: float = 0.25


def get_free_init_freq_filter(shape: Tuple[int, ...], config: FreeInitConfig) -> jnp.ndarray:
    """Low-pass filter over the trailing (T, H, W) axes. `shape` is the
    latent shape [..., T, H, W]; leading axes broadcast."""
    time, height, width = shape[-3], shape[-2], shape[-1]
    s = config.spatial_stop_frequency
    ts = config.temporal_stop_frequency
    if s == 0 or ts == 0:
        return jnp.zeros(shape[-3:], dtype=jnp.float32)

    t = (2 * jnp.arange(time) / time - 1)[:, None, None]
    h = (2 * jnp.arange(height) / height - 1)[None, :, None]
    w = (2 * jnp.arange(width) / width - 1)[None, None, :]
    d_square = ((s / ts) * t) ** 2 + h**2 + w**2

    if config.method == "butterworth":
        mask = 1.0 / (1.0 + (d_square / s**2) ** config.order)
    elif config.method == "gaussian":
        mask = jnp.exp(-1.0 / (2 * s**2) * d_square)
    elif config.method == "ideal":
        mask = (d_square <= s * 2).astype(jnp.float32)
    else:
        raise NotImplementedError("`method` must be one of gaussian, butterworth or ideal")
    return mask.astype(jnp.float32)


def apply_freq_filter(x: jnp.ndarray, noise: jnp.ndarray, low_pass_filter: jnp.ndarray) -> jnp.ndarray:
    """Noise reinitialization: low frequencies from x, high from noise
    (reference `_apply_freq_filter`, free_init_utils.py:117)."""
    axes = (-3, -2, -1)
    x_freq = jnp.fft.fftshift(jnp.fft.fftn(x.astype(jnp.float32), axes=axes), axes=axes)
    noise_freq = jnp.fft.fftshift(jnp.fft.fftn(noise.astype(jnp.float32), axes=axes), axes=axes)
    mixed = x_freq * low_pass_filter + noise_freq * (1.0 - low_pass_filter)
    out = jnp.fft.ifftn(jnp.fft.ifftshift(mixed, axes=axes), axes=axes).real
    return out.astype(x.dtype)


class FreeInitMixin:
    """Adds enable_free_init/disable_free_init + the per-iteration latent
    reinitialization step to a video pipeline."""

    def enable_free_init(self, num_iters: int = 3, use_fast_sampling: bool = False,
                         method: str = "butterworth", order: int = 4,
                         spatial_stop_frequency: float = 0.25,
                         temporal_stop_frequency: float = 0.25):
        self._free_init_config = FreeInitConfig(
            num_iters=num_iters, use_fast_sampling=use_fast_sampling, method=method,
            order=order, spatial_stop_frequency=spatial_stop_frequency,
            temporal_stop_frequency=temporal_stop_frequency,
        )

    def disable_free_init(self):
        self._free_init_config = None

    @property
    def free_init_enabled(self) -> bool:
        return getattr(self, "_free_init_config", None) is not None

    def _free_init_iterations(self, num_inference_steps: int):
        """Yield (iteration, steps_this_iteration)."""
        cfg = getattr(self, "_free_init_config", None)
        if cfg is None:
            yield 0, num_inference_steps
            return
        for it in range(cfg.num_iters):
            steps = num_inference_steps
            if cfg.use_fast_sampling:
                steps = max(1, int(num_inference_steps / cfg.num_iters * (it + 1)))
            yield it, steps

    def _free_init_reinit_latents(
        self,
        latents: jnp.ndarray,  # [..., T, H, W] denoised result of the prior iteration
        initial_noise: jnp.ndarray,
        key: jax.Array,
    ) -> jnp.ndarray:
        """Re-noise the result to t_max with the ORIGINAL initial noise, then
        frequency-mix with fresh noise (reference `_apply_free_init`,
        free_init_utils.py:135-172)."""
        cfg = self._free_init_config
        scheduler = self.scheduler
        t_max = jnp.asarray([scheduler.config.num_train_timesteps - 1] * latents.shape[0])
        x, n = latents.astype(jnp.float32), initial_noise.astype(jnp.float32)
        if hasattr(scheduler, "add_noise"):
            # our schedulers are functional: add_noise(state, x, noise, t)
            sstate = scheduler.set_timesteps(2)
            z_t = scheduler.add_noise(sstate, x, n, t_max)
        else:
            # flow-match: re-noise to σ just below 1 (σ=1 would erase x)
            sigma = jnp.full((latents.shape[0],) + (1,) * (latents.ndim - 1), 0.999, jnp.float32)
            z_t = (1.0 - sigma) * x + sigma * n
        z_rand = randn_tensor(latents.shape, key=key, dtype=jnp.float32)
        lpf = get_free_init_freq_filter(latents.shape, cfg)
        return apply_freq_filter(z_t, z_rand, lpf).astype(latents.dtype)
