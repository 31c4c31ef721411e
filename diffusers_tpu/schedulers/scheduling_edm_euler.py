"""EDM-formulation Euler sampler — functional TPU-native.

Numerics follow the reference `scheduling_edm_euler.py` (Karras et al. 2022
EDM preconditioning: c_in/c_skip/c_out/c_noise; Euler ODE step).
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
from .scheduling_utils import SchedulerMixin, broadcast_to_left, index_for_timestep


@flax.struct.dataclass
class EDMEulerSchedulerState:
    timesteps: jax.Array  # c_noise values [S]
    sigmas: jax.Array  # [S+1]
    init_noise_sigma: jax.Array
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class EDMEulerSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[EDMEulerSchedulerState] = None


class EDMEulerScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(
        self,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        sigma_data: float = 0.5,
        sigma_schedule: str = "karras",
        num_train_timesteps: int = 1000,
        prediction_type: str = "epsilon",
        rho: float = 7.0,
        final_sigmas_type: str = "zero",
    ):
        if sigma_schedule not in ("karras", "exponential"):
            raise ValueError(f"unsupported sigma_schedule {sigma_schedule}")

    def _compute_sigmas(self, ramp: np.ndarray) -> np.ndarray:
        smin, smax, rho = self.config.sigma_min, self.config.sigma_max, self.config.rho
        if self.config.sigma_schedule == "karras":
            min_inv_rho = smin ** (1 / rho)
            max_inv_rho = smax ** (1 / rho)
            return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
        return np.exp(np.linspace(np.log(smax), np.log(smin), len(ramp)))

    def precondition_inputs(self, sample, sigma):
        return sample * (1 / ((sigma**2 + self.config.sigma_data**2) ** 0.5))

    def precondition_noise(self, sigma):
        return 0.25 * jnp.log(sigma) if isinstance(sigma, jax.Array) else 0.25 * np.log(sigma)

    def precondition_outputs(self, sample, model_output, sigma):
        sd = self.config.sigma_data
        c_skip = sd**2 / (sigma**2 + sd**2)
        if self.config.prediction_type == "epsilon":
            c_out = sigma * sd / (sigma**2 + sd**2) ** 0.5
        elif self.config.prediction_type == "v_prediction":
            c_out = -sigma * sd / (sigma**2 + sd**2) ** 0.5
        else:
            raise ValueError(f"unsupported prediction_type {self.config.prediction_type}")
        return c_skip * sample + c_out * model_output

    def set_timesteps(self, num_inference_steps: int) -> EDMEulerSchedulerState:
        ramp = np.linspace(0, 1, num_inference_steps, dtype=np.float64)
        sigmas = self._compute_sigmas(ramp).astype(np.float32)
        timesteps = 0.25 * np.log(sigmas)
        if self.config.final_sigmas_type == "sigma_min":
            sigma_last = self.config.sigma_min
        else:
            sigma_last = 0.0
        sigmas = np.concatenate([sigmas, [sigma_last]]).astype(np.float32)
        return EDMEulerSchedulerState(
            timesteps=jnp.asarray(timesteps, dtype=jnp.float32),
            sigmas=jnp.asarray(sigmas, dtype=jnp.float32),
            init_noise_sigma=jnp.asarray((float(sigmas.max()) ** 2 + 1) ** 0.5, dtype=jnp.float32),
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state, sample, timestep):
        idx = index_for_timestep(state.timesteps, jnp.asarray(timestep, state.timesteps.dtype))
        return self.precondition_inputs(sample, state.sigmas[idx])

    def step(self, state, model_output, timestep, sample, return_dict: bool = True):
        idx = index_for_timestep(state.timesteps, jnp.asarray(timestep, state.timesteps.dtype))
        sigma = state.sigmas[idx]
        sigma_next = state.sigmas[idx + 1]

        sample_f = sample.astype(jnp.float32)
        pred_original = self.precondition_outputs(sample_f, model_output.astype(jnp.float32), sigma)
        derivative = (sample_f - pred_original) / sigma
        prev_sample = sample_f + derivative * (sigma_next - sigma)

        prev_sample = prev_sample.astype(model_output.dtype)
        if not return_dict:
            return (prev_sample, pred_original.astype(model_output.dtype))
        return EDMEulerSchedulerOutput(
            prev_sample=prev_sample, pred_original_sample=pred_original.astype(model_output.dtype), state=state
        )

    def add_noise(self, state, original_samples, noise, timesteps):
        schedule = state.timesteps
        ts = jnp.atleast_1d(jnp.asarray(timesteps, dtype=schedule.dtype))
        indices = jax.vmap(lambda t: index_for_timestep(schedule, t))(ts)
        sigma = broadcast_to_left(state.sigmas[indices].astype(original_samples.dtype), original_samples.ndim)
        return original_samples + noise * sigma

    def __len__(self):
        return self.config.num_train_timesteps
