"""Magnitude-Aware Momentum Boosted guidance (MAMBO-G,
https://huggingface.co/papers/2508.03320; reference
`guiders/magnitude_aware_guidance.py` `mambo_guidance`): the effective CFG
scale decays exponentially with the relative magnitude of the cond−uncond
shift, preventing over-guidance on steps where the branches already diverge.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..configuration_utils import register_to_config
from .guider_utils import BaseGuidance, rescale_noise_cfg


def mambo_guidance(
    pred_cond: jax.Array,
    pred_uncond: jax.Array,
    guidance_scale: float,
    alpha: float = 8.0,
    use_original_formulation: bool = False,
) -> jax.Array:
    axes = tuple(range(1, pred_cond.ndim))
    diff = pred_cond - pred_uncond
    num = jnp.sqrt(jnp.sum(jnp.square(diff.astype(jnp.float32)), axis=axes, keepdims=True))
    den = jnp.sqrt(jnp.sum(jnp.square(pred_uncond.astype(jnp.float32)), axis=axes, keepdims=True))
    ratio = num / jnp.maximum(den, 1e-12)
    if use_original_formulation:
        scale = guidance_scale * jnp.exp(-alpha * ratio)
    else:
        scale = 1.0 + (guidance_scale - 1.0) * jnp.exp(-alpha * ratio)
    base = pred_cond if use_original_formulation else pred_uncond
    return base + scale.astype(pred_cond.dtype) * diff


class MagnitudeAwareGuidance(BaseGuidance):
    @register_to_config
    def __init__(
        self,
        guidance_scale: float = 10.0,
        alpha: float = 8.0,
        guidance_rescale: float = 0.0,
        use_original_formulation: bool = False,
        start: float = 0.0,
        stop: float = 1.0,
    ):
        pass

    def __call__(self, pred_cond: jax.Array, pred_uncond: Optional[jax.Array] = None, step=0, num_steps: int = 1):
        cfg = self.config
        pred = mambo_guidance(
            pred_cond, pred_uncond, cfg.guidance_scale, cfg.alpha, cfg.use_original_formulation
        )
        if cfg.guidance_rescale > 0.0:
            pred = rescale_noise_cfg(pred, pred_cond, cfg.guidance_rescale)
        enabled = self._enabled(jnp.asarray(step, jnp.float32), num_steps)
        return jnp.where(enabled, pred, pred_cond)
