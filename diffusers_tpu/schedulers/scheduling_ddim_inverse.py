"""DDIM inversion scheduler — functional TPU-native.

Numerics follow the reference `scheduling_ddim_inverse.py`: the DDIM update
run forward in noise level (timesteps ascending), used for image inversion /
editing workflows.
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
from .scheduling_utils import SchedulerMixin, broadcast_to_left, index_for_timestep, make_beta_schedule


@flax.struct.dataclass
class DDIMInverseSchedulerState:
    timesteps: jax.Array  # ascending int32 [S]
    alphas_cumprod: jax.Array
    initial_alpha_cumprod: jax.Array
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class DDIMInverseSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[DDIMInverseSchedulerState] = None


class DDIMInverseScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        trained_betas: Optional[List[float]] = None,
        clip_sample: bool = True,
        set_alpha_to_one: bool = True,
        steps_offset: int = 0,
        prediction_type: str = "epsilon",
        clip_sample_range: float = 1.0,
        timestep_spacing: str = "leading",
    ):
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end, trained_betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0)
        self.initial_alpha_cumprod = np.float32(1.0) if set_alpha_to_one else self.alphas_cumprod[0]
        self.init_noise_sigma = 1.0

    def set_timesteps(self, num_inference_steps: int) -> DDIMInverseSchedulerState:
        T = self.config.num_train_timesteps
        if self.config.timestep_spacing == "leading":
            step_ratio = T // num_inference_steps
            ts = (np.arange(0, num_inference_steps) * step_ratio).round().copy().astype(np.int64)
            ts += self.config.steps_offset
        elif self.config.timestep_spacing == "trailing":
            step_ratio = T / num_inference_steps
            ts = np.round(np.arange(T, 0, -step_ratio))[::-1].astype(np.int64)
            ts -= 1
        elif self.config.timestep_spacing == "linspace":
            ts = np.linspace(0, T - 1, num_inference_steps).round().astype(np.int64)
        else:
            raise ValueError(f"unsupported timestep_spacing {self.config.timestep_spacing}")
        return DDIMInverseSchedulerState(
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            alphas_cumprod=jnp.asarray(self.alphas_cumprod, dtype=jnp.float32),
            initial_alpha_cumprod=jnp.asarray(self.initial_alpha_cumprod, dtype=jnp.float32),
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state, sample, timestep=None):
        return sample

    def step(
        self,
        state: DDIMInverseSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        return_dict: bool = True,
    ):
        t = jnp.asarray(timestep, dtype=jnp.int32)
        # inversion: "previous" is t, current is t - T//S (reference step)
        prev_t = t
        cur_t = t - self.config.num_train_timesteps // state.num_inference_steps

        acp = state.alphas_cumprod
        alpha_prod_t = jnp.where(cur_t >= 0, acp[jnp.clip(cur_t, 0)], state.initial_alpha_cumprod)
        alpha_prod_t_prev = acp[prev_t]
        beta_prod_t = 1 - alpha_prod_t

        sample_f = sample.astype(jnp.float32)
        mo = model_output.astype(jnp.float32)
        if self.config.prediction_type == "epsilon":
            pred_x0 = (sample_f - beta_prod_t**0.5 * mo) / alpha_prod_t**0.5
            pred_eps = mo
        elif self.config.prediction_type == "sample":
            pred_x0 = mo
            pred_eps = (sample_f - alpha_prod_t**0.5 * pred_x0) / beta_prod_t**0.5
        elif self.config.prediction_type == "v_prediction":
            pred_x0 = alpha_prod_t**0.5 * sample_f - beta_prod_t**0.5 * mo
            pred_eps = alpha_prod_t**0.5 * mo + beta_prod_t**0.5 * sample_f
        else:
            raise ValueError(f"unsupported prediction_type {self.config.prediction_type}")

        if self.config.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -self.config.clip_sample_range, self.config.clip_sample_range)

        pred_sample_direction = (1 - alpha_prod_t_prev) ** 0.5 * pred_eps
        prev_sample = alpha_prod_t_prev**0.5 * pred_x0 + pred_sample_direction

        prev_sample = prev_sample.astype(model_output.dtype)
        if not return_dict:
            return (prev_sample, pred_x0.astype(model_output.dtype))
        return DDIMInverseSchedulerOutput(
            prev_sample=prev_sample, pred_original_sample=pred_x0.astype(model_output.dtype), state=state
        )

    def add_noise(self, state, original_samples, noise, timesteps):
        acp = state.alphas_cumprod.astype(original_samples.dtype)
        a = broadcast_to_left(acp[timesteps] ** 0.5, original_samples.ndim)
        b = broadcast_to_left((1 - acp[timesteps]) ** 0.5, original_samples.ndim)
        return a * original_samples + b * noise

    def __len__(self):
        return self.config.num_train_timesteps
