"""Guidance base class + shared math.

Functional mirror of the reference guiders subsystem
(`/root/reference/src/diffusers/guiders/guider_utils.py:38` BaseGuidance,
`:374` rescale_noise_cfg). Guiders here are pure: `__call__(pred_cond,
pred_uncond, step, num_steps)` returns the guided prediction; step-range
gating uses traced `jnp.where` so guiders compose into scanned denoise loops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..configuration_utils import ConfigMixin


def rescale_noise_cfg(noise_cfg: jax.Array, noise_pred_text: jax.Array, guidance_rescale: float = 0.0) -> jax.Array:
    """Sec. 3.4 of https://huggingface.co/papers/2305.08891."""
    axes = tuple(range(1, noise_pred_text.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    noise_pred_rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * noise_pred_rescaled + (1 - guidance_rescale) * noise_cfg


class BaseGuidance(ConfigMixin):
    """Common surface: `num_conditions`, step-range gating, `__call__`."""

    config_name = "guider_config.json"
    _input_predictions = ["pred_cond", "pred_uncond"]

    @property
    def num_conditions(self) -> int:
        return 2

    def _enabled(self, step: jax.Array, num_steps: int) -> jax.Array:
        """Traced start/stop gating (reference guider_utils.py:95-120)."""
        start = getattr(self.config, "start", 0.0)
        stop = getattr(self.config, "stop", 1.0)
        frac = step / jnp.maximum(num_steps, 1)
        return (frac >= start) & (frac < stop)

    def __call__(self, pred_cond: jax.Array, pred_uncond: Optional[jax.Array] = None, step=0, num_steps: int = 1):
        raise NotImplementedError
