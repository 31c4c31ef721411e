"""EMA of model parameters.

Functional mirror of the reference `EMAModel`
(`/root/reference/src/diffusers/training_utils.py:631`): same decay warmup
schedule (min_decay→decay with power ramp), expressed as a pure update over
the params pytree — one fused multiply-add per leaf under jit.
"""

from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class EMAState:
    shadow_params: Any
    optimization_step: jax.Array  # int32

    @property
    def params(self):
        return self.shadow_params


class EMAModel:
    def __init__(
        self,
        decay: float = 0.9999,
        min_decay: float = 0.0,
        update_after_step: int = 0,
        use_ema_warmup: bool = False,
        inv_gamma: float = 1.0,
        power: float = 2 / 3,
    ):
        self.decay = decay
        self.min_decay = min_decay
        self.update_after_step = update_after_step
        self.use_ema_warmup = use_ema_warmup
        self.inv_gamma = inv_gamma
        self.power = power

    def init(self, params) -> EMAState:
        # copy (not alias): params buffers are commonly donated to the train step
        return EMAState(
            shadow_params=jax.tree.map(jnp.copy, params),
            optimization_step=jnp.asarray(0, dtype=jnp.int32),
        )

    def get_decay(self, optimization_step: jax.Array) -> jax.Array:
        """Decay warmup (reference training_utils.py:694-712)."""
        step = jnp.maximum(optimization_step - self.update_after_step - 1, 0)
        if self.use_ema_warmup:
            cur_decay = 1 - (1 + step / self.inv_gamma) ** -self.power
        else:
            cur_decay = (1 + step) / (10 + step)
        cur_decay = jnp.minimum(cur_decay, self.decay)
        cur_decay = jnp.where(step <= 0, 0.0, cur_decay)
        return jnp.maximum(cur_decay, self.min_decay)

    def update(self, state: EMAState, params) -> EMAState:
        step = state.optimization_step + 1
        decay = self.get_decay(step)
        new_shadow = jax.tree.map(
            lambda s, p: s - (1 - decay) * (s - p.astype(s.dtype)), state.shadow_params, params
        )
        return EMAState(shadow_params=new_shadow, optimization_step=step)
