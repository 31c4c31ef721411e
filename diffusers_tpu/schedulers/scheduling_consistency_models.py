"""Consistency Models multistep stochastic iterative sampler — functional
TPU-native.

Numerics follow the reference `scheduling_consistency_models.py`: timesteps
map to Karras sigmas (rho-schedule), boundary-condition scalings
(c_skip, c_out with epsilon = sigma_min), stochastic z-injection between
steps. Noise comes from an explicit PRNG key (or `variance_noise`) so the step
is pure for `lax.scan`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import ConfigMixin, register_to_config
from ..utils import BaseOutput
from ..utils.jax_utils import randn_tensor
from .scheduling_utils import SchedulerMixin, broadcast_to_left, index_for_timestep


@flax.struct.dataclass
class CMStochasticIterativeSchedulerState:
    timesteps: jax.Array  # [S] float64→float32 scaled timesteps
    sigmas: jax.Array  # [S+1]
    step_index: jax.Array
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=80.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class CMStochasticIterativeSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[CMStochasticIterativeSchedulerState] = None


class CMStochasticIterativeScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 40,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        sigma_data: float = 0.5,
        s_noise: float = 1.0,
        rho: float = 7.0,
        clip_denoised: bool = True,
    ):
        self.init_noise_sigma = sigma_max

    def _convert_to_karras(self, ramp: np.ndarray) -> np.ndarray:
        min_inv_rho = self.config.sigma_min ** (1 / self.config.rho)
        max_inv_rho = self.config.sigma_max ** (1 / self.config.rho)
        return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** self.config.rho

    def sigma_to_t(self, sigmas: np.ndarray) -> np.ndarray:
        return 1000 * 0.25 * np.log(np.asarray(sigmas, dtype=np.float64) + 1e-44)

    def set_timesteps(
        self, num_inference_steps: Optional[int] = None, timesteps: Optional[List[int]] = None
    ) -> CMStochasticIterativeSchedulerState:
        T = self.config.num_train_timesteps
        if timesteps is not None:
            ts = np.asarray(timesteps, dtype=np.int64)
        else:
            step_ratio = T // num_inference_steps
            ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy().astype(np.int64)
        ramp = ts[::-1].copy() / (T - 1)
        sigmas = self._convert_to_karras(ramp)
        scaled_ts = self.sigma_to_t(sigmas)
        sigmas = np.concatenate([sigmas, [self.config.sigma_min]]).astype(np.float32)
        return CMStochasticIterativeSchedulerState(
            timesteps=jnp.asarray(scaled_ts, dtype=jnp.float32),
            sigmas=jnp.asarray(sigmas),
            step_index=jnp.asarray(0, dtype=jnp.int32),
            init_noise_sigma=self.config.sigma_max,
            num_inference_steps=len(ts),
        )

    def scale_model_input(self, state, sample, timestep=None):
        sigma = state.sigmas[state.step_index]
        return sample / ((sigma**2 + self.config.sigma_data**2) ** 0.5)

    def get_scalings_for_boundary_condition(self, sigma):
        sigma_min, sigma_data = self.config.sigma_min, self.config.sigma_data
        c_skip = sigma_data**2 / ((sigma - sigma_min) ** 2 + sigma_data**2)
        c_out = (sigma - sigma_min) * sigma_data / (sigma**2 + sigma_data**2) ** 0.5
        return c_skip, c_out

    def step(
        self,
        state,
        model_output,
        timestep,
        sample,
        key: Optional[jax.Array] = None,
        variance_noise: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        idx = state.step_index
        sigma = state.sigmas[idx]
        sigma_next = state.sigmas[jnp.minimum(idx + 1, state.sigmas.shape[0] - 1)]

        c_skip, c_out = self.get_scalings_for_boundary_condition(sigma)
        sample_f = sample.astype(jnp.float32)
        denoised = c_out * model_output.astype(jnp.float32) + c_skip * sample_f
        if self.config.clip_denoised:
            denoised = jnp.clip(denoised, -1.0, 1.0)

        if state.timesteps.shape[0] > 1:
            if variance_noise is None:
                if key is None:
                    raise ValueError("multistep CM sampling requires a PRNG key or variance_noise")
                variance_noise = randn_tensor(model_output.shape, key=key, dtype=jnp.float32)
            z = variance_noise.astype(jnp.float32) * self.config.s_noise
        else:
            z = jnp.zeros_like(denoised)

        sigma_hat = jnp.clip(sigma_next, self.config.sigma_min, self.config.sigma_max)
        prev_sample = (denoised + z * (sigma_hat**2 - self.config.sigma_min**2) ** 0.5).astype(model_output.dtype)

        new_state = state.replace(step_index=idx + 1)
        if not return_dict:
            return (prev_sample, new_state)
        return CMStochasticIterativeSchedulerOutput(prev_sample=prev_sample, state=new_state)

    def add_noise(self, state, original_samples, noise, timesteps):
        schedule = state.timesteps
        ts = jnp.atleast_1d(jnp.asarray(timesteps, dtype=schedule.dtype))
        indices = jax.vmap(lambda t: index_for_timestep(schedule, t))(ts)
        sigma = broadcast_to_left(state.sigmas[indices].astype(original_samples.dtype), original_samples.ndim)
        return original_samples + noise * sigma

    def __len__(self):
        return self.config.num_train_timesteps
