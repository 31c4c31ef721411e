"""Tangential CFG (TCFG, https://huggingface.co/papers/2503.18137; reference
`guiders/tangential_classifier_free_guidance.py` `normalized_guidance`):
project the unconditional prediction onto the principal subspace of
[cond, uncond] (rank-1 of the 2-row SVD), removing the tangential component
before the usual CFG update.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..configuration_utils import register_to_config
from .guider_utils import BaseGuidance, rescale_noise_cfg


def tcfg_normalized_guidance(
    pred_cond: jax.Array,
    pred_uncond: jax.Array,
    guidance_scale: float,
    use_original_formulation: bool = False,
) -> jax.Array:
    dtype = pred_cond.dtype
    b = pred_cond.shape[0]
    preds = jnp.stack([pred_cond, pred_uncond], axis=1).astype(jnp.float32).reshape(b, 2, -1)
    _, _, vh = jnp.linalg.svd(preds, full_matrices=False)  # vh: [B, 2, N]
    vh_modified = vh.at[:, 1].set(0.0)
    uncond_flat = pred_uncond.reshape(b, 1, -1).astype(jnp.float32)
    x_vh = jnp.matmul(uncond_flat, jnp.swapaxes(vh, -2, -1))  # [B, 1, 2]
    x_vh_v = jnp.matmul(x_vh, vh_modified)  # [B, 1, N]
    pred_uncond_proj = x_vh_v.reshape(pred_uncond.shape).astype(dtype)
    base = pred_cond if use_original_formulation else pred_uncond_proj
    return base + guidance_scale * (pred_cond - pred_uncond_proj)


class TangentialClassifierFreeGuidance(BaseGuidance):
    @register_to_config
    def __init__(
        self,
        guidance_scale: float = 7.5,
        guidance_rescale: float = 0.0,
        use_original_formulation: bool = False,
        start: float = 0.0,
        stop: float = 1.0,
    ):
        pass

    def __call__(self, pred_cond: jax.Array, pred_uncond: Optional[jax.Array] = None, step=0, num_steps: int = 1):
        cfg = self.config
        pred = tcfg_normalized_guidance(
            pred_cond, pred_uncond, cfg.guidance_scale, cfg.use_original_formulation
        )
        if cfg.guidance_rescale > 0.0:
            pred = rescale_noise_cfg(pred, pred_cond, cfg.guidance_rescale)
        enabled = self._enabled(jnp.asarray(step, jnp.float32), num_steps)
        return jnp.where(enabled, pred, pred_cond)
