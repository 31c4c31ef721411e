"""Frequency-Decoupled Guidance (FDG, https://huggingface.co/papers/2506.19713;
reference `guiders/frequency_decoupled_guidance.py`): decompose predictions
into a Laplacian pyramid and apply CFG per frequency band with separate
scales (high bands get stronger guidance). The reference delegates the pyramid
to kornia; here pyrdown/pyrup are implemented directly with the standard
5-tap binomial kernel — pure jnp convs, fully scannable.

Inputs are NCHW latents (the layout our pipelines' noise predictions use).
"""

from __future__ import annotations

import math
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import register_to_config
from .guider_utils import BaseGuidance, rescale_noise_cfg

# 5-tap binomial (gaussian) kernel, the classic Burt-Adelson pyramid filter
_KERNEL_1D = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
_KERNEL_2D = np.outer(_KERNEL_1D, _KERNEL_1D).astype(np.float32)  # [5, 5]


def _blur(x: jax.Array) -> jax.Array:
    """Depthwise 5x5 gaussian blur, reflect padding (kornia semantics)."""
    b, c, h, w = x.shape
    kern = jnp.asarray(_KERNEL_2D).reshape(5, 5, 1, 1)
    kern = jnp.tile(kern, (1, 1, 1, c))  # HWIO with feature groups
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (2, 2)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp.astype(jnp.float32),
        kern,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        feature_group_count=c,
    ).astype(x.dtype)


def pyr_down(x: jax.Array) -> jax.Array:
    return _blur(x)[:, :, ::2, ::2]


def pyr_up(x: jax.Array) -> jax.Array:
    """Zero-stuffed upsample + 4x-scaled blur (kornia pyrup)."""
    b, c, h, w = x.shape
    up = jnp.zeros((b, c, h * 2, w * 2), dtype=x.dtype)
    up = up.at[:, :, ::2, ::2].set(x)
    return _blur(up) * 4.0


def build_laplacian_pyramid(x: jax.Array, levels: int) -> List[jax.Array]:
    """pyramid[i] = g_i − pyrup(g_{i+1}); last level is the coarse residual."""
    pyramid = []
    current = x
    for _ in range(levels - 1):
        down = pyr_down(current)
        pyramid.append(current - pyr_up(down))
        current = down
    pyramid.append(current)
    return pyramid


def build_image_from_pyramid(pyramid: List[jax.Array]) -> jax.Array:
    img = pyramid[-1]
    for i in range(len(pyramid) - 2, -1, -1):
        img = pyr_up(img) + pyramid[i]
    return img


def _project(v0: jax.Array, v1: jax.Array):
    axes = tuple(range(1, v0.ndim))
    v0f, v1f = v0.astype(jnp.float32), v1.astype(jnp.float32)
    v1n = v1f / jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(v1f), axis=axes, keepdims=True)), 1e-12)
    parallel = jnp.sum(v0f * v1n, axis=axes, keepdims=True) * v1n
    return parallel.astype(v0.dtype), (v0f - parallel).astype(v0.dtype)


class FrequencyDecoupledGuidance(BaseGuidance):
    @register_to_config
    def __init__(
        self,
        guidance_scales: tuple = (10.0, 5.0),  # high → low frequency
        guidance_rescale: Union[float, tuple] = 0.0,
        parallel_weights: Optional[tuple] = None,
        use_original_formulation: bool = False,
        guidance_rescale_space: str = "freq",
        start: Union[float, tuple] = 0.0,
        stop: Union[float, tuple] = 1.0,
    ):
        pass

    @property
    def levels(self) -> int:
        return len(self.config.guidance_scales)

    def _per_level(self, value, level):
        if isinstance(value, (list, tuple)):
            return value[level]
        return value

    def __call__(self, pred_cond: jax.Array, pred_uncond: Optional[jax.Array] = None, step=0, num_steps: int = 1):
        cfg = self.config
        step = jnp.asarray(step, jnp.float32)
        frac = step / jnp.maximum(num_steps, 1)

        cond_pyr = build_laplacian_pyramid(pred_cond, self.levels)
        uncond_pyr = build_laplacian_pyramid(pred_uncond, self.levels)

        guided = []
        for level in range(self.levels):
            g = cfg.guidance_scales[level]
            pw = self._per_level(cfg.parallel_weights, level) if cfg.parallel_weights is not None else 1.0
            rs = self._per_level(cfg.guidance_rescale, level)
            lo = self._per_level(cfg.start, level)
            hi = self._per_level(cfg.stop, level)

            c, u = cond_pyr[level], uncond_pyr[level]
            shift = c - u
            if not math.isclose(pw, 1.0):
                par, orth = _project(shift, c)
                shift = pw * par + orth
            base = c if cfg.use_original_formulation else u
            pred = base + g * shift
            if cfg.guidance_rescale_space == "freq" and rs > 0.0:
                pred = rescale_noise_cfg(pred, c, rs)
            level_on = (frac >= lo) & (frac < hi)
            guided.append(jnp.where(level_on, pred, c))

        pred = build_image_from_pyramid(guided)
        rs0 = self._per_level(cfg.guidance_rescale, 0)
        if cfg.guidance_rescale_space == "data" and rs0 > 0.0:
            pred = rescale_noise_cfg(pred, pred_cond, rs0)
        return pred
