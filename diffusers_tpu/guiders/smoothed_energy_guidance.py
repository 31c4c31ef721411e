"""Smoothed Energy Guidance (SEG, https://huggingface.co/papers/2408.00760;
reference `guiders/smoothed_energy_guidance.py` +
`hooks/smoothed_energy_guidance_utils.py`): the perturbed forward blurs the
self-attention *query* projections with a 2D gaussian over the (square)
visual-token grid; guidance then contrasts the clean and blurred conditional
predictions like SLG/PAG.

The blur is a trace-time flag on `models.attention.Attention`
(`seg_blur_sigma`), flipped by the `seg_blurred` context manager around the
perturbed forward — the same pattern as PAG's `pag_identity`.
"""

from __future__ import annotations

import math
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import register_to_config
from .guider_utils import BaseGuidance, rescale_noise_cfg


def seg_gaussian_blur_2d(query: jax.Array, kernel_size: int, sigma: float) -> jax.Array:
    """Blur [B, S, D] queries as a sqrt(S)x sqrt(S) grid (reference
    `_gaussian_blur_2d`, smoothed_energy_guidance_utils.py:110). Infinite
    sigma (>= 9999.9) collapses to the per-image mean query."""
    b, s, d = query.shape
    if sigma >= 9999.9:
        mean = jnp.mean(query, axis=1, keepdims=True)
        return jnp.broadcast_to(mean, query.shape)
    side = int(math.isqrt(s))
    if side * side != s:
        return query  # non-square token grids: blur is undefined; no-op
    half = (kernel_size - 1) / 2
    x = np.linspace(-half, half, kernel_size)
    pdf = np.exp(-0.5 * (x / sigma) ** 2)
    k1 = (pdf / pdf.sum()).astype(np.float32)
    k2 = np.outer(k1, k1)
    grid = query.reshape(b, side, side, d).astype(jnp.float32)
    kern = jnp.asarray(k2).reshape(kernel_size, kernel_size, 1, 1)
    kern = jnp.tile(kern, (1, 1, 1, d))
    pad = kernel_size // 2
    gp = jnp.pad(grid, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        gp, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=d,
    )
    return out.reshape(b, s, d).astype(query.dtype)


class seg_blurred:
    """Trace-time context: set `seg_blur_sigma` on the given Attention modules
    around the perturbed forward."""

    def __init__(self, attentions, sigma: float):
        self.attentions = attentions
        self.sigma = sigma

    def __enter__(self):
        for m in self.attentions:
            m.seg_blur_sigma = self.sigma

    def __exit__(self, *exc):
        for m in self.attentions:
            m.seg_blur_sigma = None
        return False


class SmoothedEnergyGuidance(BaseGuidance):
    _input_predictions = ["pred_cond", "pred_uncond", "pred_cond_seg"]

    @register_to_config
    def __init__(
        self,
        guidance_scale: float = 7.5,
        seg_guidance_scale: float = 3.0,
        seg_blur_sigma: float = 9999999.0,
        seg_blur_threshold_inf: float = 9999.9,
        seg_guidance_start: float = 0.0,
        seg_guidance_stop: float = 1.0,
        seg_guidance_layers: Optional[Union[int, List[int]]] = None,
        guidance_rescale: float = 0.0,
        use_original_formulation: bool = False,
        start: float = 0.0,
        stop: float = 1.0,
    ):
        pass

    @property
    def num_conditions(self) -> int:
        return 3

    def __call__(
        self,
        pred_cond: jax.Array,
        pred_uncond: Optional[jax.Array] = None,
        pred_cond_seg: Optional[jax.Array] = None,
        step=0,
        num_steps: int = 1,
    ):
        cfg = self.config
        step = jnp.asarray(step, jnp.float32)
        frac = step / jnp.maximum(num_steps, 1)

        if pred_uncond is not None:
            base = pred_cond if cfg.use_original_formulation else pred_uncond
            pred = base + cfg.guidance_scale * (pred_cond - pred_uncond)
        else:
            pred = pred_cond
        if pred_cond_seg is not None:
            seg_on = (frac >= cfg.seg_guidance_start) & (frac < cfg.seg_guidance_stop)
            pred = pred + jnp.where(seg_on, cfg.seg_guidance_scale, 0.0) * (pred_cond - pred_cond_seg)

        if cfg.guidance_rescale > 0.0:
            pred = rescale_noise_cfg(pred, pred_cond, cfg.guidance_rescale)
        enabled = self._enabled(step, num_steps)
        return jnp.where(enabled, pred, pred_cond)
