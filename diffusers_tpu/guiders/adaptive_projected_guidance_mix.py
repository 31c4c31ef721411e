"""APG-Mix — CFG for early steps, Adaptive Projected Guidance after
`apg_start_step` (reference `guiders/adaptive_projected_guidance_mix.py`):
the momentum buffer is warmed up during the CFG phase and consumed by APG.
Traced step gating (`jnp.where` over both branches) keeps it scannable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..configuration_utils import register_to_config
from .adaptive_projected_guidance import normalized_guidance
from .guider_utils import BaseGuidance, rescale_noise_cfg


class AdaptiveProjectedMixGuidance(BaseGuidance):
    @register_to_config
    def __init__(
        self,
        guidance_scale: float = 7.5,
        adaptive_projected_guidance_scale: float = 7.5,
        adaptive_projected_guidance_momentum: float = -0.5,
        adaptive_projected_guidance_rescale: float = 10.0,
        eta: float = 0.0,
        adaptive_projected_guidance_start_step: int = 0,
        guidance_rescale: float = 0.0,
        use_original_formulation: bool = False,
        start: float = 0.0,
        stop: float = 1.0,
    ):
        pass

    def init_momentum(self, shape, dtype=jnp.float32) -> jax.Array:
        return jnp.zeros(shape, dtype=dtype)

    def __call__(
        self,
        pred_cond: jax.Array,
        pred_uncond: Optional[jax.Array] = None,
        step=0,
        num_steps: int = 1,
        momentum: Optional[jax.Array] = None,
    ):
        cfg = self.config
        step = jnp.asarray(step, jnp.float32)
        beta = cfg.adaptive_projected_guidance_momentum

        # CFG branch (momentum warms up): m' = beta*m + diff
        diff = pred_cond - pred_uncond
        base = pred_cond if cfg.use_original_formulation else pred_uncond
        cfg_pred = base + cfg.guidance_scale * diff

        # APG branch (consumes momentum)
        apg_pred, apg_momentum = normalized_guidance(
            pred_cond,
            pred_uncond,
            cfg.adaptive_projected_guidance_scale,
            momentum=momentum,
            momentum_beta=beta,
            eta=cfg.eta,
            norm_threshold=cfg.adaptive_projected_guidance_rescale,
            use_original_formulation=cfg.use_original_formulation,
        )

        in_apg_phase = step >= cfg.adaptive_projected_guidance_start_step
        pred = jnp.where(in_apg_phase, apg_pred, cfg_pred)
        if cfg.guidance_rescale > 0.0:
            pred = rescale_noise_cfg(pred, pred_cond, cfg.guidance_rescale)
        enabled = self._enabled(step, num_steps)
        pred = jnp.where(enabled, pred, pred_cond)
        if momentum is not None:
            # both phases update the buffer identically (beta*m + diff)
            new_momentum = beta * momentum + diff
            return pred, new_momentum
        return pred
