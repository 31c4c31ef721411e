"""Euler-Ancestral sampler — functional TPU-native implementation.

Numerics follow the reference `scheduling_euler_ancestral_discrete.py`
(`/root/reference/src/diffusers/schedulers/scheduling_euler_ancestral_discrete.py`):
Euler ODE step to sigma_down plus ancestral noise sigma_up.
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
from .scheduling_utils import (
    KarrasDiffusionSchedulers,
    SchedulerMixin,
    broadcast_to_left,
    index_for_timestep,
    make_beta_schedule,
    rescale_zero_terminal_snr,
)


@flax.struct.dataclass
class EulerAncestralDiscreteSchedulerState:
    timesteps: jax.Array
    sigmas: jax.Array
    init_noise_sigma: jax.Array
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class EulerAncestralDiscreteSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[EulerAncestralDiscreteSchedulerState] = None


class EulerAncestralDiscreteScheduler(SchedulerMixin, ConfigMixin):
    _compatibles = [e.name for e in KarrasDiffusionSchedulers]
    order = 1

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        trained_betas: Optional[List[float]] = None,
        prediction_type: str = "epsilon",
        timestep_spacing: str = "linspace",
        steps_offset: int = 0,
        rescale_betas_zero_snr: bool = False,
    ):
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end, trained_betas)
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0)
        if rescale_betas_zero_snr:
            self.alphas_cumprod[-1] = 2**-24

    def set_timesteps(self, num_inference_steps: int) -> EulerAncestralDiscreteSchedulerState:
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
        sigmas = np.interp(timesteps, np.arange(0, len(sigmas_full)), sigmas_full)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)

        if self.config.timestep_spacing in ("linspace", "trailing"):
            init_noise_sigma = float(sigmas.max())
        else:
            init_noise_sigma = float((sigmas.max() ** 2 + 1) ** 0.5)

        return EulerAncestralDiscreteSchedulerState(
            timesteps=jnp.asarray(timesteps, dtype=jnp.float32),
            sigmas=jnp.asarray(sigmas, dtype=jnp.float32),
            init_noise_sigma=jnp.asarray(init_noise_sigma, dtype=jnp.float32),
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state, sample: jax.Array, timestep) -> jax.Array:
        idx = index_for_timestep(state.timesteps, jnp.asarray(timestep, dtype=state.timesteps.dtype))
        sigma = state.sigmas[idx]
        return sample / ((sigma**2 + 1) ** 0.5)

    def step(
        self,
        state: EulerAncestralDiscreteSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        key: Optional[jax.Array] = None,
        variance_noise: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        idx = index_for_timestep(state.timesteps, jnp.asarray(timestep, dtype=state.timesteps.dtype))
        sigma = state.sigmas[idx]

        sample_f = sample.astype(jnp.float32)
        model_output_f = model_output.astype(jnp.float32)

        if self.config.prediction_type == "epsilon":
            pred_original_sample = sample_f - sigma * model_output_f
        elif self.config.prediction_type == "v_prediction":
            pred_original_sample = model_output_f * (-sigma / (sigma**2 + 1) ** 0.5) + (sample_f / (sigma**2 + 1))
        elif self.config.prediction_type == "sample":
            raise NotImplementedError("prediction_type 'sample' is not supported (matches reference)")
        else:
            raise ValueError(f"unsupported prediction_type {self.config.prediction_type}")

        sigma_from = state.sigmas[idx]
        sigma_to = state.sigmas[idx + 1]
        sigma_up = jnp.sqrt(jnp.maximum(sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2, 0.0))
        sigma_down = jnp.sqrt(jnp.maximum(sigma_to**2 - sigma_up**2, 0.0))

        derivative = (sample_f - pred_original_sample) / sigma
        dt = sigma_down - sigma
        prev_sample = sample_f + derivative * dt

        if variance_noise is None:
            if key is None:
                raise ValueError("EulerAncestral requires a PRNG key or variance_noise for the ancestral step")
            variance_noise = randn_tensor(model_output.shape, key=key, dtype=jnp.float32)
        prev_sample = prev_sample + variance_noise.astype(jnp.float32) * sigma_up

        prev_sample = prev_sample.astype(model_output.dtype)
        if not return_dict:
            return (prev_sample, pred_original_sample.astype(model_output.dtype))
        return EulerAncestralDiscreteSchedulerOutput(
            prev_sample=prev_sample,
            pred_original_sample=pred_original_sample.astype(model_output.dtype),
            state=state,
        )

    def add_noise(self, state, original_samples, noise, timesteps):
        schedule = state.timesteps
        ts = jnp.atleast_1d(jnp.asarray(timesteps, dtype=schedule.dtype))
        indices = jax.vmap(lambda t: index_for_timestep(schedule, t))(ts)
        sigma = broadcast_to_left(state.sigmas[indices].astype(original_samples.dtype), original_samples.ndim)
        return original_samples + noise * sigma

    def __len__(self):
        return self.config.num_train_timesteps
