"""Heun (2nd-order) sampler — functional TPU-native implementation.

Numerics follow the reference `scheduling_heun_discrete.py`
(`/root/reference/src/diffusers/schedulers/scheduling_heun_discrete.py`):
interleaved timesteps (each but the first appears twice); even step indices
run the Euler predictor, odd indices the Heun corrector using the buffered
derivative/dt/sample carried in the state.
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
from .scheduling_utils import (
    KarrasDiffusionSchedulers,
    SchedulerMixin,
    broadcast_to_left,
    index_for_timestep,
    make_beta_schedule,
    rescale_zero_terminal_snr,
)
from .sigma_utils import convert_to_karras, sigma_to_t


@flax.struct.dataclass
class HeunDiscreteSchedulerState:
    timesteps: jax.Array  # float32 [2S-1]
    sigmas: jax.Array  # float32 [2S]
    step_index: jax.Array
    prev_derivative: Optional[jax.Array]
    buffered_sample: Optional[jax.Array]
    dt: jax.Array  # float32 scalar
    init_noise_sigma: jax.Array
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class HeunDiscreteSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[HeunDiscreteSchedulerState] = None


class HeunDiscreteScheduler(SchedulerMixin, ConfigMixin):
    _compatibles = [e.name for e in KarrasDiffusionSchedulers]
    order = 2

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "linear",
        trained_betas: Optional[List[float]] = None,
        prediction_type: str = "epsilon",
        use_karras_sigmas: bool = False,
        clip_sample: bool = False,
        clip_sample_range: float = 1.0,
        timestep_spacing: str = "linspace",
        steps_offset: int = 0,
    ):
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end, trained_betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0)

    def set_timesteps(self, num_inference_steps: int, sample_shape: Optional[tuple] = None) -> HeunDiscreteSchedulerState:
        if self.config.timestep_spacing == "linspace":
            timesteps = np.linspace(0, self.config.num_train_timesteps - 1, num_inference_steps, dtype=np.float32)[
                ::-1
            ].copy()
        elif self.config.timestep_spacing == "leading":
            step_ratio = self.config.num_train_timesteps // num_inference_steps
            timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy().astype(np.float32)
            timesteps += self.config.steps_offset
        elif self.config.timestep_spacing == "trailing":
            step_ratio = self.config.num_train_timesteps / num_inference_steps
            timesteps = (np.arange(self.config.num_train_timesteps, 0, -step_ratio)).round().copy().astype(np.float32)
            timesteps -= 1
        else:
            raise ValueError(f"unsupported timestep_spacing {self.config.timestep_spacing}")

        sigmas_full = np.array(((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5)
        log_sigmas = np.log(sigmas_full)
        sigmas = np.interp(timesteps, np.arange(0, len(sigmas_full)), sigmas_full)
        if self.config.use_karras_sigmas:
            sigmas = convert_to_karras(sigmas, num_inference_steps)
            timesteps = np.array([sigma_to_t(s, log_sigmas) for s in sigmas])
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)

        # interleave
        sigmas_i = np.concatenate([sigmas[:1], np.repeat(sigmas[1:-1], 2), sigmas[-1:]])
        timesteps_i = np.concatenate([timesteps[:1], np.repeat(timesteps[1:], 2)]).astype(np.float32)

        if self.config.timestep_spacing in ("linspace", "trailing"):
            init_noise_sigma = float(sigmas.max())
        else:
            init_noise_sigma = float((sigmas.max() ** 2 + 1) ** 0.5)

        prev_derivative = None
        buffered_sample = None
        if sample_shape is not None:
            prev_derivative = jnp.zeros(sample_shape, dtype=jnp.float32)
            buffered_sample = jnp.zeros(sample_shape, dtype=jnp.float32)

        return HeunDiscreteSchedulerState(
            timesteps=jnp.asarray(timesteps_i, dtype=jnp.float32),
            sigmas=jnp.asarray(sigmas_i, dtype=jnp.float32),
            step_index=jnp.asarray(0, dtype=jnp.int32),
            prev_derivative=prev_derivative,
            buffered_sample=buffered_sample,
            dt=jnp.asarray(0.0, dtype=jnp.float32),
            init_noise_sigma=jnp.asarray(init_noise_sigma, dtype=jnp.float32),
            num_inference_steps=num_inference_steps,
        )

    def prepare(self, state: HeunDiscreteSchedulerState, sample: jax.Array) -> HeunDiscreteSchedulerState:
        if state.prev_derivative is not None:
            return state
        return state.replace(
            prev_derivative=jnp.zeros(sample.shape, dtype=jnp.float32),
            buffered_sample=jnp.zeros(sample.shape, dtype=jnp.float32),
        )

    def scale_model_input(self, state, sample: jax.Array, timestep) -> jax.Array:
        sigma = state.sigmas[state.step_index]
        return sample / ((sigma**2 + 1) ** 0.5)

    def step(
        self,
        state: HeunDiscreteSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        return_dict: bool = True,
    ):
        state = self.prepare(state, sample)
        idx = state.step_index
        in_first_order = (idx % 2) == 0

        sigma = jnp.where(in_first_order, state.sigmas[idx], state.sigmas[jnp.maximum(idx - 1, 0)])
        sigma_next = jnp.where(in_first_order, state.sigmas[idx + 1], state.sigmas[idx])

        sample_f = sample.astype(jnp.float32)
        model_output_f = model_output.astype(jnp.float32)

        sigma_input = jnp.where(in_first_order, sigma, sigma_next)
        if self.config.prediction_type == "epsilon":
            pred_original_sample = sample_f - sigma_input * model_output_f
        elif self.config.prediction_type == "v_prediction":
            pred_original_sample = model_output_f * (-sigma_input / (sigma_input**2 + 1) ** 0.5) + (
                sample_f / (sigma_input**2 + 1)
            )
        elif self.config.prediction_type == "sample":
            pred_original_sample = model_output_f
        else:
            raise ValueError(f"unsupported prediction_type {self.config.prediction_type}")

        if self.config.clip_sample:
            pred_original_sample = jnp.clip(pred_original_sample, -self.config.clip_sample_range, self.config.clip_sample_range)

        # first order: Euler predictor; second order: average with buffered derivative
        deriv_first = (sample_f - pred_original_sample) / jnp.where(sigma == 0, 1.0, sigma)
        deriv_second = ((sample_f - pred_original_sample) / jnp.where(sigma_next == 0, 1.0, sigma_next) + state.prev_derivative) / 2

        derivative = jnp.where(in_first_order, deriv_first, deriv_second)
        dt = jnp.where(in_first_order, sigma_next - sigma, state.dt)
        base_sample = jnp.where(in_first_order, sample_f, state.buffered_sample)
        prev_sample = (base_sample + derivative * dt).astype(model_output.dtype)

        new_state = state.replace(
            step_index=idx + 1,
            prev_derivative=jnp.where(in_first_order, deriv_first, state.prev_derivative),
            buffered_sample=jnp.where(in_first_order, sample_f, state.buffered_sample),
            dt=dt,
        )
        if not return_dict:
            return (prev_sample, new_state)
        return HeunDiscreteSchedulerOutput(
            prev_sample=prev_sample, pred_original_sample=pred_original_sample.astype(model_output.dtype), state=new_state
        )

    def add_noise(self, state, original_samples, noise, timesteps):
        schedule = state.timesteps
        ts = jnp.atleast_1d(jnp.asarray(timesteps, dtype=schedule.dtype))
        indices = jax.vmap(lambda t: index_for_timestep(schedule, t))(ts)
        sigma = broadcast_to_left(state.sigmas[indices].astype(original_samples.dtype), original_samples.ndim)
        return original_samples + noise * sigma

    def __len__(self):
        return self.config.num_train_timesteps
