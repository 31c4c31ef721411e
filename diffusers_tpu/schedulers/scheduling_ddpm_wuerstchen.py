"""DDPMWuerstchenScheduler — cosine continuous-time DDPM used by
Wuerstchen / Stable Cascade.

Behavioral mirror of the reference
`schedulers/scheduling_ddpm_wuerstchen.py` (`:89`): alpha_cumprod(t) =
cos²((t+s)/(1+s)·π/2)/cos²(s/(1+s)·π/2) clamped to [1e-4, 0.9999]
(`:121`), timesteps = linspace(1, 0, N+1) (`:167`), ancestral step with
noise gated by prev_t != 0 (`:216`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from ..configuration_utils import ConfigMixin, register_to_config
from ..utils import BaseOutput
from ..utils.jax_utils import randn_tensor
from .scheduling_utils import SchedulerMixin


@flax.struct.dataclass
class DDPMWuerstchenSchedulerState:
    timesteps: jax.Array  # [N+1] descending 1..0
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: int = flax.struct.field(pytree_node=False, default=0)


@dataclass
class DDPMWuerstchenSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[DDPMWuerstchenSchedulerState] = None


class DDPMWuerstchenScheduler(SchedulerMixin, ConfigMixin):
    @register_to_config
    def __init__(self, scaler: float = 1.0, s: float = 0.008):
        self.scaler = scaler
        self.s = s
        self._init_alpha_cumprod = math.cos(s / (1 + s) * math.pi * 0.5) ** 2
        self.init_noise_sigma = 1.0

    def _alpha_cumprod(self, t):
        if self.scaler > 1:
            t = 1 - (1 - t) ** self.scaler
        elif self.scaler < 1:
            t = t**self.scaler
        acp = jnp.cos((t + self.s) / (1 + self.s) * jnp.pi * 0.5) ** 2 / self._init_alpha_cumprod
        return jnp.clip(acp, 0.0001, 0.9999)

    def scale_model_input(self, state, sample, timestep=None):
        return sample

    def set_timesteps(self, num_inference_steps: Optional[int] = None, timesteps=None):
        if timesteps is None:
            timesteps = jnp.linspace(1.0, 0.0, num_inference_steps + 1)
        else:
            timesteps = jnp.asarray(timesteps)
        return DDPMWuerstchenSchedulerState(
            timesteps=timesteps,
            num_inference_steps=(len(timesteps) - 1) if num_inference_steps is None else num_inference_steps,
        )

    def step(self, state, model_output, timestep, sample, prev_timestep=None,
             key: Optional[jax.Array] = None, return_dict: bool = True):
        """`timestep`/`prev_timestep` are the continuous t values (scalars or
        [B]); pass consecutive entries of `state.timesteps`."""
        t = jnp.atleast_1d(jnp.asarray(timestep))
        prev_t = jnp.atleast_1d(jnp.asarray(prev_timestep))
        expand = lambda a: a.reshape(-1, *([1] * (sample.ndim - 1)))

        alpha_cumprod = expand(self._alpha_cumprod(t))
        alpha_cumprod_prev = expand(self._alpha_cumprod(prev_t))
        alpha = alpha_cumprod / alpha_cumprod_prev

        mu = (1.0 / alpha) ** 0.5 * (sample - (1 - alpha) * model_output / (1 - alpha_cumprod) ** 0.5)
        if key is None:
            key = jax.random.PRNGKey(0)
        noise = randn_tensor(mu.shape, key=key, dtype=mu.dtype)
        std = ((1 - alpha) * (1.0 - alpha_cumprod_prev) / (1.0 - alpha_cumprod)) ** 0.5 * noise
        pred = mu + std * expand((prev_t != 0).astype(mu.dtype))

        if not return_dict:
            return (pred,)
        return DDPMWuerstchenSchedulerOutput(prev_sample=pred, state=state)

    def add_noise(self, state, original_samples, noise, timesteps):
        acp = self._alpha_cumprod(jnp.asarray(timesteps)).reshape(
            -1, *([1] * (original_samples.ndim - 1))
        )
        return (acp**0.5) * original_samples + ((1 - acp) ** 0.5) * noise
