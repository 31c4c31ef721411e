"""CogVideoX DDIM variant — functional TPU-native implementation.

Numerics follow the reference `scheduling_ddim_cogvideox.py`
(`/root/reference/src/diffusers/schedulers/scheduling_ddim_cogvideox.py:328`):
same spaced-timestep DDIM skeleton, but the update is expressed as
``prev = a_t · sample + b_t · x̂₀`` with
``a_t = sqrt((1−ᾱ_prev)/(1−ᾱ_t))``, ``b_t = sqrt(ᾱ_prev) − sqrt(ᾱ_t)·a_t``
(deterministic; no eta/variance path)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import ConfigMixin, register_to_config
from ..utils import BaseOutput
from .scheduling_ddim import DDIMSchedulerState
from .scheduling_utils import (
    KarrasDiffusionSchedulers,
    SchedulerMixin,
    broadcast_to_left,
    make_beta_schedule,
    make_spaced_timesteps,
    rescale_zero_terminal_snr,
)


@dataclass
class CogVideoXDDIMSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[DDIMSchedulerState] = None


class CogVideoXDDIMScheduler(SchedulerMixin, ConfigMixin):
    _compatibles = [e.name for e in KarrasDiffusionSchedulers]
    order = 1

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.0120,
        beta_schedule: str = "scaled_linear",
        trained_betas: Optional[List[float]] = None,
        clip_sample: bool = True,
        set_alpha_to_one: bool = True,
        steps_offset: int = 0,
        prediction_type: str = "epsilon",
        clip_sample_range: float = 1.0,
        sample_max_value: float = 1.0,
        timestep_spacing: str = "leading",
        rescale_betas_zero_snr: bool = False,
        snr_shift_scale: float = 3.0,
    ):
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end, trained_betas)
        alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
        # SNR shift (reference `:205-207`): ᾱ ← ᾱ / (s − (s−1)·ᾱ)
        alphas_cumprod = alphas_cumprod / (snr_shift_scale - (snr_shift_scale - 1.0) * alphas_cumprod)
        if rescale_betas_zero_snr:
            # rescale operates on betas in the base DDIM; here ᾱ is already
            # shifted, so apply it to the ᾱ ladder (reference `:210-211`
            # rescale_zero_terminal_snr on alphas_cumprod)
            sqrt_ac = np.sqrt(alphas_cumprod)
            sqrt_ac_0, sqrt_ac_T = sqrt_ac[0].copy(), sqrt_ac[-1].copy()
            sqrt_ac -= sqrt_ac_T
            sqrt_ac *= sqrt_ac_0 / (sqrt_ac_0 - sqrt_ac_T)
            alphas_cumprod = sqrt_ac**2
        self.alphas_cumprod = alphas_cumprod
        self.final_alpha_cumprod = np.float32(1.0) if set_alpha_to_one else alphas_cumprod[0]
        self.init_noise_sigma = 1.0

    def set_timesteps(self, num_inference_steps: int) -> DDIMSchedulerState:
        ts = make_spaced_timesteps(
            num_inference_steps,
            self.config.num_train_timesteps,
            self.config.timestep_spacing,
            self.config.steps_offset,
        )
        return DDIMSchedulerState(
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            alphas_cumprod=jnp.asarray(self.alphas_cumprod, dtype=jnp.float32),
            final_alpha_cumprod=jnp.asarray(self.final_alpha_cumprod, dtype=jnp.float32),
            init_noise_sigma=1.0,
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state, sample, timestep=None):
        return sample

    def step(
        self,
        state: DDIMSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        return_dict: bool = True,
    ):
        prev_timestep = timestep - self.config.num_train_timesteps // state.num_inference_steps
        alpha_prod_t = state.alphas_cumprod[timestep]
        alpha_prod_t_prev = jnp.where(
            prev_timestep >= 0,
            state.alphas_cumprod[jnp.maximum(prev_timestep, 0)],
            state.final_alpha_cumprod,
        )
        beta_prod_t = 1.0 - alpha_prod_t

        mo = model_output.astype(jnp.float32)
        x = sample.astype(jnp.float32)
        if self.config.prediction_type == "epsilon":
            x0 = (x - beta_prod_t**0.5 * mo) / alpha_prod_t**0.5
        elif self.config.prediction_type == "sample":
            x0 = mo
        elif self.config.prediction_type == "v_prediction":
            x0 = alpha_prod_t**0.5 * x - beta_prod_t**0.5 * mo
        else:
            raise ValueError(f"unknown prediction_type {self.config.prediction_type}")

        a_t = ((1.0 - alpha_prod_t_prev) / (1.0 - alpha_prod_t)) ** 0.5
        b_t = alpha_prod_t_prev**0.5 - alpha_prod_t**0.5 * a_t
        prev_sample = (a_t * x + b_t * x0).astype(sample.dtype)

        if not return_dict:
            return (prev_sample, x0)
        return CogVideoXDDIMSchedulerOutput(prev_sample=prev_sample, pred_original_sample=x0, state=state)

    def add_noise(self, state, original_samples, noise, timesteps):
        ac = state.alphas_cumprod.astype(original_samples.dtype)
        sqrt_a = broadcast_to_left(ac[timesteps] ** 0.5, original_samples.ndim)
        sqrt_1ma = broadcast_to_left((1 - ac[timesteps]) ** 0.5, original_samples.ndim)
        return sqrt_a * original_samples + sqrt_1ma * noise

    def get_velocity(self, state, sample, noise, timesteps):
        ac = state.alphas_cumprod.astype(sample.dtype)
        sqrt_a = broadcast_to_left(ac[timesteps] ** 0.5, sample.ndim)
        sqrt_1ma = broadcast_to_left((1 - ac[timesteps]) ** 0.5, sample.ndim)
        return sqrt_a * noise - sqrt_1ma * sample
