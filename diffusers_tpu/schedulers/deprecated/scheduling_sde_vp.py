"""Score-SDE VP (variance-preserving) scheduler.

Numerics follow the reference
(`/root/reference/src/diffusers/schedulers/deprecated/scheduling_sde_vp.py`
ScoreSdeVpScheduler): continuous timesteps linspace(1, eps, N), reverse-SDE
Euler-Maruyama predictor with the score rescaled by the marginal std.
"""

from __future__ import annotations

import math
from typing import Optional

import flax
import jax
import jax.numpy as jnp

from ...configuration_utils import ConfigMixin, register_to_config
from ..scheduling_utils import SchedulerMixin


@flax.struct.dataclass
class ScoreSdeVpSchedulerState:
    timesteps: jax.Array
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


class ScoreSdeVpScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(self, num_train_timesteps=2000, beta_min=0.1, beta_max=20, sampling_eps=1e-3):
        pass

    def set_timesteps(self, num_inference_steps: int) -> ScoreSdeVpSchedulerState:
        return ScoreSdeVpSchedulerState(
            timesteps=jnp.linspace(1.0, self.config.sampling_eps, num_inference_steps),
            num_inference_steps=num_inference_steps)

    def step_pred(self, state, score: jax.Array, x: jax.Array, t, key: jax.Array):
        t = jnp.asarray(t, jnp.float32)
        log_mean_coeff = (-0.25 * t**2 * (self.config.beta_max - self.config.beta_min)
                          - 0.5 * t * self.config.beta_min)
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * log_mean_coeff))
        std = std.reshape((-1,) + (1,) * (score.ndim - 1)) if std.ndim else std
        score = -score / std
        dt = -1.0 / state.num_inference_steps
        beta_t = self.config.beta_min + t * (self.config.beta_max - self.config.beta_min)
        drift = -0.5 * beta_t * x - beta_t * score
        diffusion = jnp.sqrt(beta_t)
        x_mean = x + drift * dt
        noise = jax.random.normal(key, x.shape, x.dtype)
        x = x_mean + diffusion * math.sqrt(-dt) * noise
        return x, x_mean

    def __len__(self):
        return self.config.num_train_timesteps
