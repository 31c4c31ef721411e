"""Flow-matching Heun (2nd-order) sampler — functional TPU-native implementation.

Numerics follow the reference `scheduling_flow_match_heun_discrete.py`
(`/root/reference/src/diffusers/schedulers/scheduling_flow_match_heun_discrete.py`:
shifted sigma ladder `:155-170`, interleaved timesteps `:166`, Euler predictor
/ Heun corrector `:291-330` with the x0 parameterization
``denoised = x − v·σ``). Second-order buffers (derivative, dt, sample) are
scan-carried state; first/second-order selection is the step-index parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import ConfigMixin, register_to_config
from ..utils import BaseOutput
from .scheduling_utils import SchedulerMixin, broadcast_to_left, index_for_timestep


@flax.struct.dataclass
class FlowMatchHeunDiscreteSchedulerState:
    timesteps: jax.Array  # float32 [2S-1]
    sigmas: jax.Array  # float32 [2S]
    step_index: jax.Array
    prev_derivative: Optional[jax.Array]
    buffered_sample: Optional[jax.Array]
    dt: jax.Array
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class FlowMatchHeunDiscreteSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[FlowMatchHeunDiscreteSchedulerState] = None


class FlowMatchHeunDiscreteScheduler(SchedulerMixin, ConfigMixin):
    order = 2

    @register_to_config
    def __init__(self, num_train_timesteps: int = 1000, shift: float = 1.0):
        sigmas = np.linspace(1, num_train_timesteps, num_train_timesteps, dtype=np.float64)[::-1] / num_train_timesteps
        sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        self.sigma_min = float(sigmas[-1])
        self.sigma_max = float(sigmas[0])
        self.init_noise_sigma = 1.0

    def _sigma_to_t(self, sigma):
        return sigma * self.config.num_train_timesteps

    def set_timesteps(self, num_inference_steps: int, sample_shape: Optional[tuple] = None):
        ts = np.linspace(
            self._sigma_to_t(self.sigma_max), self._sigma_to_t(self.sigma_min), num_inference_steps,
            dtype=np.float64,
        )
        sigmas = ts / self.config.num_train_timesteps
        sigmas = self.config.shift * sigmas / (1 + (self.config.shift - 1) * sigmas)
        timesteps = sigmas * self.config.num_train_timesteps
        timesteps = np.concatenate([timesteps[:1], np.repeat(timesteps[1:], 2)])
        sigmas = np.concatenate([sigmas, [0.0]])
        sigmas = np.concatenate([sigmas[:1], np.repeat(sigmas[1:-1], 2), sigmas[-1:]])

        prev_derivative = buffered_sample = None
        if sample_shape is not None:
            prev_derivative = jnp.zeros(sample_shape, jnp.float32)
            buffered_sample = jnp.zeros(sample_shape, jnp.float32)
        return FlowMatchHeunDiscreteSchedulerState(
            timesteps=jnp.asarray(timesteps, jnp.float32),
            sigmas=jnp.asarray(sigmas, jnp.float32),
            step_index=jnp.asarray(0, jnp.int32),
            prev_derivative=prev_derivative,
            buffered_sample=buffered_sample,
            dt=jnp.asarray(0.0, jnp.float32),
            num_inference_steps=num_inference_steps,
        )

    def prepare(self, state, sample):
        if state.prev_derivative is not None:
            return state
        return state.replace(
            prev_derivative=jnp.zeros(sample.shape, jnp.float32),
            buffered_sample=jnp.zeros(sample.shape, jnp.float32),
        )

    def scale_model_input(self, state, sample, timestep=None):
        return sample

    def scale_noise(self, state, sample, timestep, noise):
        idx = index_for_timestep(state.timesteps, jnp.asarray(timestep).reshape(()))
        sigma = state.sigmas[idx]
        return sigma * noise + (1.0 - sigma) * sample

    def step(self, state, model_output, timestep, sample, return_dict: bool = True):
        if state.num_inference_steps is None:
            raise ValueError("run set_timesteps before step")
        state = self.prepare(state, sample)
        idx = state.step_index
        in_first_order = (idx % 2) == 0

        sample_f = sample.astype(jnp.float32)
        model_output = model_output.astype(jnp.float32)

        sigma = jnp.where(in_first_order, state.sigmas[idx], state.sigmas[jnp.maximum(idx - 1, 0)])
        sigma_next = jnp.where(in_first_order, state.sigmas[idx + 1], state.sigmas[idx])

        # first order: denoised = x − v·σ ; derivative = (x − denoised)/σ = v
        denoised_1 = sample_f - model_output * sigma
        derivative_1 = (sample_f - denoised_1) / jnp.maximum(sigma, 1e-12)
        dt_1 = sigma_next - sigma

        # second order (corrector): uses σ_next and the buffered state
        denoised_2 = sample_f - model_output * sigma_next
        derivative_2 = (sample_f - denoised_2) / jnp.maximum(sigma_next, 1e-12)
        derivative_2 = 0.5 * (state.prev_derivative + derivative_2)

        base = jnp.where(in_first_order, sample_f, state.buffered_sample)
        derivative = jnp.where(in_first_order, derivative_1, derivative_2)
        dt = jnp.where(in_first_order, dt_1, state.dt)
        prev_sample = (base + derivative * dt).astype(sample.dtype)

        new_state = state.replace(
            step_index=idx + 1,
            prev_derivative=jnp.where(in_first_order, derivative_1, state.prev_derivative),
            buffered_sample=jnp.where(in_first_order, sample_f, state.buffered_sample),
            dt=jnp.where(in_first_order, dt_1, state.dt),
        )
        if not return_dict:
            return (prev_sample, new_state)
        return FlowMatchHeunDiscreteSchedulerOutput(prev_sample=prev_sample, state=new_state)

    def __len__(self):
        return self.config.num_train_timesteps
