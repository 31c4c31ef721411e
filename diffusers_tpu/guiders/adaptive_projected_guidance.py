"""APG — adaptive projected guidance (https://huggingface.co/papers/2410.02416;
reference guiders/adaptive_projected_guidance.py). The momentum buffer becomes
an explicit carry value so the guider composes into scanned loops."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..configuration_utils import register_to_config
from .guider_utils import BaseGuidance


def normalized_guidance(
    pred_cond: jax.Array,
    pred_uncond: jax.Array,
    guidance_scale: float,
    momentum: Optional[jax.Array] = None,
    momentum_beta: float = 0.0,
    eta: float = 1.0,
    norm_threshold: float = 0.0,
    use_original_formulation: bool = False,
    norm_axes: Optional[Tuple[int, ...]] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    # norm_axes mirrors the reference's `norm_dim` (ACE-Step normalizes over
    # the time axis only); default is all non-batch axes.
    axes = tuple(range(1, pred_cond.ndim)) if norm_axes is None else tuple(norm_axes)
    diff = pred_cond - pred_uncond
    new_momentum = None
    if momentum is not None:
        new_momentum = momentum_beta * momentum + diff
        diff = new_momentum
    if norm_threshold > 0:
        diff_norm = jnp.sqrt(jnp.sum(jnp.square(diff), axis=axes, keepdims=True))
        scale_factor = jnp.minimum(jnp.ones_like(diff_norm), norm_threshold / diff_norm)
        diff = diff * scale_factor
    v0 = diff.astype(jnp.float32)
    v1 = pred_cond.astype(jnp.float32)
    v1 = v1 / jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(v1), axis=axes, keepdims=True)), 1e-12)
    v0_parallel = jnp.sum(v0 * v1, axis=axes, keepdims=True) * v1
    v0_orthogonal = v0 - v0_parallel
    normalized_update = (v0_orthogonal + eta * v0_parallel).astype(diff.dtype)
    base = pred_cond if use_original_formulation else pred_uncond
    return base + guidance_scale * normalized_update, new_momentum


class AdaptiveProjectedGuidance(BaseGuidance):
    @register_to_config
    def __init__(
        self,
        guidance_scale: float = 7.5,
        adaptive_projected_guidance_momentum: Optional[float] = None,
        adaptive_projected_guidance_rescale: float = 15.0,
        eta: float = 1.0,
        guidance_rescale: float = 0.0,
        use_original_formulation: bool = False,
        start: float = 0.0,
        stop: float = 1.0,
    ):
        pass

    def init_momentum(self, shape, dtype=jnp.float32) -> Optional[jax.Array]:
        if self.config.adaptive_projected_guidance_momentum is None:
            return None
        return jnp.zeros(shape, dtype=dtype)

    def __call__(
        self,
        pred_cond: jax.Array,
        pred_uncond: Optional[jax.Array] = None,
        step=0,
        num_steps: int = 1,
        momentum: Optional[jax.Array] = None,
    ):
        pred, new_momentum = normalized_guidance(
            pred_cond,
            pred_uncond,
            self.config.guidance_scale,
            momentum=momentum,
            momentum_beta=self.config.adaptive_projected_guidance_momentum or 0.0,
            eta=self.config.eta,
            norm_threshold=self.config.adaptive_projected_guidance_rescale,
            use_original_formulation=self.config.use_original_formulation,
        )
        enabled = self._enabled(jnp.asarray(step, jnp.float32), num_steps)
        pred = jnp.where(enabled, pred, pred_cond)
        if momentum is not None:
            return pred, new_momentum
        return pred
