"""CFG-Zero* guidance (https://huggingface.co/papers/2503.18886; reference
guiders/classifier_free_zero_star_guidance.py)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..configuration_utils import register_to_config
from .guider_utils import BaseGuidance, rescale_noise_cfg


def cfg_zero_star_scale(cond: jax.Array, uncond: jax.Array, eps: float = 1e-8) -> jax.Array:
    cond_f = cond.astype(jnp.float32).reshape(cond.shape[0], -1)
    uncond_f = uncond.astype(jnp.float32).reshape(uncond.shape[0], -1)
    dot = jnp.sum(cond_f * uncond_f, axis=1, keepdims=True)
    sq = jnp.sum(uncond_f**2, axis=1, keepdims=True) + eps
    scale = dot / sq
    return scale.reshape(cond.shape[0], *(1,) * (cond.ndim - 1)).astype(cond.dtype)


class ClassifierFreeZeroStarGuidance(BaseGuidance):
    @register_to_config
    def __init__(
        self,
        guidance_scale: float = 7.5,
        zero_init_steps: int = 1,
        guidance_rescale: float = 0.0,
        use_original_formulation: bool = False,
        start: float = 0.0,
        stop: float = 1.0,
    ):
        pass

    def __call__(self, pred_cond: jax.Array, pred_uncond: Optional[jax.Array] = None, step=0, num_steps: int = 1):
        alpha = cfg_zero_star_scale(pred_cond, pred_uncond)
        scaled_uncond = pred_uncond * alpha
        shift = pred_cond - scaled_uncond
        base = pred_cond if self.config.use_original_formulation else scaled_uncond
        pred = base + self.config.guidance_scale * shift
        if self.config.guidance_rescale > 0.0:
            pred = rescale_noise_cfg(pred, pred_cond, self.config.guidance_rescale)
        step_arr = jnp.asarray(step, jnp.float32)
        pred = jnp.where(step_arr < self.config.zero_init_steps, jnp.zeros_like(pred), pred)
        enabled = self._enabled(step_arr, num_steps)
        return jnp.where(enabled, pred, pred_cond)
