"""Karras VE (EDM appendix-E) stochastic scheduler.

Numerics follow the reference
(`/root/reference/src/diffusers/schedulers/deprecated/scheduling_karras_ve.py`
KarrasVeScheduler): geometric sigma grid, Langevin churn
`sigma_hat = sigma·(1 + gamma)` with `gamma = min(s_churn/N, sqrt(2)−1)` in
[s_min, s_max], Euler predictor + Heun corrector in (x, x0) space.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config
from ...utils import BaseOutput
from ..scheduling_utils import SchedulerMixin


@flax.struct.dataclass
class KarrasVeSchedulerState:
    timesteps: jax.Array
    schedule: jax.Array  # sigma(t_i)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class KarrasVeOutput(BaseOutput):
    prev_sample: jax.Array
    derivative: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[KarrasVeSchedulerState] = None


class KarrasVeScheduler(SchedulerMixin, ConfigMixin):
    order = 2

    @register_to_config
    def __init__(self, sigma_min: float = 0.02, sigma_max: float = 100, s_noise: float = 1.007,
                 s_churn: float = 80, s_min: float = 0.05, s_max: float = 50):
        self.init_noise_sigma = sigma_max

    def set_timesteps(self, num_inference_steps: int) -> KarrasVeSchedulerState:
        ts = np.arange(0, num_inference_steps)[::-1].copy()
        schedule = np.array([
            self.config.sigma_max**2
            * (self.config.sigma_min**2 / self.config.sigma_max**2) ** (i / (num_inference_steps - 1))
            for i in ts
        ], np.float32)
        return KarrasVeSchedulerState(
            timesteps=jnp.asarray(ts, jnp.int32), schedule=jnp.asarray(schedule),
            num_inference_steps=num_inference_steps)

    def add_noise_to_input(self, state, sample: jax.Array, sigma, key: jax.Array):
        """Langevin-like churn to sigma_hat (reference add_noise_to_input)."""
        in_range = (self.config.s_min <= sigma) & (sigma <= self.config.s_max)
        gamma = jnp.where(in_range,
                          min(self.config.s_churn / state.num_inference_steps, 2**0.5 - 1), 0.0)
        eps = self.config.s_noise * jax.random.normal(key, sample.shape, jnp.float32)
        sigma_hat = sigma + gamma * sigma
        sample_hat = sample + jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0)) * eps
        return sample_hat, sigma_hat

    def step(self, state, model_output: jax.Array, sigma_hat, sigma_prev,
             sample_hat: jax.Array, return_dict: bool = True):
        pred_original = sample_hat + sigma_hat * model_output
        derivative = (sample_hat - pred_original) / sigma_hat
        sample_prev = sample_hat + (sigma_prev - sigma_hat) * derivative
        if not return_dict:
            return (sample_prev, derivative)
        return KarrasVeOutput(prev_sample=sample_prev, derivative=derivative,
                              pred_original_sample=pred_original, state=state)

    def step_correct(self, state, model_output: jax.Array, sigma_hat, sigma_prev,
                     sample_hat: jax.Array, sample_prev: jax.Array, derivative: jax.Array,
                     return_dict: bool = True):
        pred_original = sample_prev + sigma_prev * model_output
        derivative_corr = (sample_prev - pred_original) / sigma_prev
        sample_prev = sample_hat + (sigma_prev - sigma_hat) * (0.5 * derivative + 0.5 * derivative_corr)
        if not return_dict:
            return (sample_prev, derivative)
        return KarrasVeOutput(prev_sample=sample_prev, derivative=derivative,
                              pred_original_sample=pred_original, state=state)

    def __len__(self):
        return 1000
