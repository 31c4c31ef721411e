"""AutoGuidance — guide with a degraded version of the model as the
"unconditional" branch (https://huggingface.co/papers/2406.02507).

Functional mirror of the reference `guiders/auto_guidance.py`: the guidance
formula is CFG's, but `pred_uncond` comes from a conditional forward run with
`auto_guidance_layers` skipped (our trace-time `layer_skip` flags — use
`guiders.skip_layer_guidance.layers_skipped` + `select_skip_blocks` around the
degraded forward, matching the reference's LayerSkipConfig hooks).
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ..configuration_utils import register_to_config
from .guider_utils import BaseGuidance, rescale_noise_cfg


class AutoGuidance(BaseGuidance):
    _input_predictions = ["pred_cond", "pred_uncond"]

    @register_to_config
    def __init__(
        self,
        guidance_scale: float = 7.5,
        auto_guidance_layers: Optional[Union[int, List[int]]] = None,
        dropout: Optional[float] = None,
        guidance_rescale: float = 0.0,
        use_original_formulation: bool = False,
        start: float = 0.0,
        stop: float = 1.0,
    ):
        if auto_guidance_layers is None:
            raise ValueError("`auto_guidance_layers` must be provided to enable AutoGuidance.")

    def __call__(self, pred_cond: jax.Array, pred_uncond: Optional[jax.Array] = None, step=0, num_steps: int = 1):
        """`pred_uncond` is the degraded-model prediction (layers skipped)."""
        cfg = self.config
        shift = pred_cond - pred_uncond
        base = pred_cond if cfg.use_original_formulation else pred_uncond
        pred = base + cfg.guidance_scale * shift
        if cfg.guidance_rescale > 0.0:
            pred = rescale_noise_cfg(pred, pred_cond, cfg.guidance_rescale)
        enabled = self._enabled(jnp.asarray(step, jnp.float32), num_steps)
        return jnp.where(enabled, pred, pred_cond)
