"""Variance-exploding SDE (Score-SDE VE) predictor-corrector sampler —
functional TPU-native.

Numerics follow the reference `scheduling_sde_ve.py:48` (ScoreSdeVeScheduler):
geometric discrete sigma ladder, reverse-SDE predictor (`step_pred`, eq. 6 of
Song et al.) and SNR-scaled Langevin corrector (`step_correct`). Noise comes
from explicit PRNG keys so both steps are pure for `lax.scan`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import ConfigMixin, register_to_config
from ..utils import BaseOutput
from ..utils.jax_utils import randn_tensor
from .scheduling_utils import SchedulerMixin, broadcast_to_left


@flax.struct.dataclass
class ScoreSdeVeSchedulerState:
    timesteps: jax.Array  # [S] continuous in (eps, 1]
    discrete_sigmas: jax.Array  # [S] geometric ladder
    sigmas: jax.Array  # [S] per-timestep sigma
    init_noise_sigma: jax.Array
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class SdeVeOutput(BaseOutput):
    prev_sample: jax.Array
    prev_sample_mean: Optional[jax.Array] = None
    state: Optional[ScoreSdeVeSchedulerState] = None


class ScoreSdeVeScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 2000,
        snr: float = 0.15,
        sigma_min: float = 0.01,
        sigma_max: float = 1348.0,
        sampling_eps: float = 1e-5,
        correct_steps: int = 1,
    ):
        self.init_noise_sigma = sigma_max

    def set_timesteps(self, num_inference_steps: int, sampling_eps: Optional[float] = None):
        eps = sampling_eps if sampling_eps is not None else self.config.sampling_eps
        timesteps = np.linspace(1, eps, num_inference_steps, dtype=np.float32)
        smin, smax = self.config.sigma_min, self.config.sigma_max
        discrete = np.exp(np.linspace(math.log(smin), math.log(smax), num_inference_steps)).astype(np.float32)
        sigmas = (smin * (smax / smin) ** timesteps).astype(np.float32)
        return ScoreSdeVeSchedulerState(
            timesteps=jnp.asarray(timesteps),
            discrete_sigmas=jnp.asarray(discrete),
            sigmas=jnp.asarray(sigmas),
            init_noise_sigma=jnp.asarray(self.config.sigma_max, jnp.float32),
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state, sample: jax.Array, timestep=None) -> jax.Array:
        return sample

    def step_pred(self, state: ScoreSdeVeSchedulerState, model_output: jax.Array, timestep,
                  sample: jax.Array, key: Optional[jax.Array] = None,
                  noise: Optional[jax.Array] = None, return_dict: bool = True):
        t = jnp.asarray(timestep, jnp.float32)
        idx = (t * (state.timesteps.shape[0] - 1)).astype(jnp.int32)
        sigma = state.discrete_sigmas[idx]
        adjacent = jnp.where(idx == 0, 0.0, state.discrete_sigmas[jnp.clip(idx - 1, 0)])
        diffusion = broadcast_to_left(jnp.sqrt(sigma**2 - adjacent**2)[None], sample.ndim)
        drift = -(diffusion**2) * model_output

        if noise is None:
            noise = randn_tensor(sample.shape, key=key, dtype=sample.dtype)
        prev_sample_mean = sample - drift
        prev_sample = prev_sample_mean + diffusion * noise

        if not return_dict:
            return (prev_sample, prev_sample_mean)
        return SdeVeOutput(prev_sample=prev_sample, prev_sample_mean=prev_sample_mean, state=state)

    def step_correct(self, state: ScoreSdeVeSchedulerState, model_output: jax.Array,
                     sample: jax.Array, key: Optional[jax.Array] = None,
                     noise: Optional[jax.Array] = None, return_dict: bool = True):
        if noise is None:
            noise = randn_tensor(sample.shape, key=key, dtype=sample.dtype)
        grad_norm = jnp.mean(jnp.linalg.norm(model_output.reshape(model_output.shape[0], -1), axis=-1))
        noise_norm = jnp.mean(jnp.linalg.norm(noise.reshape(noise.shape[0], -1), axis=-1))
        step_size = (self.config.snr * noise_norm / grad_norm) ** 2 * 2
        step_size = broadcast_to_left(jnp.broadcast_to(step_size, (sample.shape[0],)), sample.ndim)
        prev_sample_mean = sample + step_size * model_output
        prev_sample = prev_sample_mean + jnp.sqrt(step_size * 2) * noise
        if not return_dict:
            return (prev_sample,)
        return SdeVeOutput(prev_sample=prev_sample, prev_sample_mean=prev_sample_mean, state=state)

    def add_noise(self, state: ScoreSdeVeSchedulerState, original_samples, noise, timesteps):
        sigmas = broadcast_to_left(state.discrete_sigmas[timesteps], original_samples.ndim)
        return original_samples + noise * sigmas
