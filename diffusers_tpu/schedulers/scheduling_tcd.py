"""TCD (trajectory consistency distillation) sampler — functional TPU-native.

Numerics follow the reference `scheduling_tcd.py` (strategic stochastic
sampling: denoise to timestep_s = floor((1-γ)·prev_t), then re-noise to
prev_t). Timestep selection shares the LCM schedule.
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
    SchedulerMixin,
    broadcast_to_left,
    index_for_timestep,
    make_beta_schedule,
    rescale_zero_terminal_snr,
)


@flax.struct.dataclass
class TCDSchedulerState:
    timesteps: jax.Array
    alphas_cumprod: jax.Array
    final_alpha_cumprod: jax.Array
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class TCDSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_noised_sample: Optional[jax.Array] = None
    state: Optional[TCDSchedulerState] = None


class TCDScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        trained_betas: Optional[List[float]] = None,
        original_inference_steps: int = 50,
        clip_sample: bool = False,
        clip_sample_range: float = 1.0,
        set_alpha_to_one: bool = True,
        steps_offset: int = 0,
        prediction_type: str = "epsilon",
        thresholding: bool = False,
        dynamic_thresholding_ratio: float = 0.995,
        sample_max_value: float = 1.0,
        timestep_spacing: str = "leading",
        timestep_scaling: float = 10.0,
        rescale_betas_zero_snr: bool = False,
    ):
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end, trained_betas)
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0)
        self.final_alpha_cumprod = np.float32(1.0) if set_alpha_to_one else self.alphas_cumprod[0]
        self.init_noise_sigma = 1.0

    def set_timesteps(
        self,
        num_inference_steps: Optional[int] = None,
        original_inference_steps: Optional[int] = None,
        timesteps: Optional[List[int]] = None,
        strength: float = 1.0,
    ) -> TCDSchedulerState:
        original_steps = original_inference_steps or self.config.original_inference_steps
        k = self.config.num_train_timesteps // original_steps
        lcm_origin_timesteps = np.asarray(list(range(1, int(original_steps * strength) + 1))) * k - 1
        if timesteps is not None:
            ts = np.array(timesteps, dtype=np.int64)
            num_inference_steps = len(ts)
        else:
            lcm_origin_timesteps = lcm_origin_timesteps[::-1].copy()
            inference_indices = np.floor(
                np.linspace(0, len(lcm_origin_timesteps), num=num_inference_steps, endpoint=False)
            ).astype(np.int64)
            ts = lcm_origin_timesteps[inference_indices]
        return TCDSchedulerState(
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            alphas_cumprod=jnp.asarray(self.alphas_cumprod, dtype=jnp.float32),
            final_alpha_cumprod=jnp.asarray(self.final_alpha_cumprod, dtype=jnp.float32),
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state, sample, timestep=None):
        return sample

    def step(
        self,
        state: TCDSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        eta: float = 0.3,
        key: Optional[jax.Array] = None,
        variance_noise: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        assert 0 <= eta <= 1.0
        t = jnp.asarray(timestep, dtype=jnp.int32)
        idx = index_for_timestep(state.timesteps, t)
        S = state.timesteps.shape[0]
        prev_t = jnp.where(idx + 1 < S, state.timesteps[jnp.minimum(idx + 1, S - 1)], 0)
        timestep_s = jnp.floor((1 - eta) * prev_t).astype(jnp.int32)

        acp = state.alphas_cumprod
        alpha_prod_t = acp[t]
        beta_prod_t = 1 - alpha_prod_t
        alpha_prod_t_prev = jnp.where(prev_t >= 0, acp[jnp.clip(prev_t, 0)], state.final_alpha_cumprod)
        alpha_prod_s = acp[timestep_s]
        beta_prod_s = 1 - alpha_prod_s

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

        pred_noised = alpha_prod_s**0.5 * pred_x0 + beta_prod_s**0.5 * pred_eps

        if eta > 0:
            if variance_noise is None:
                if key is None:
                    raise ValueError("TCD with eta > 0 requires a PRNG key or variance_noise")
                variance_noise = randn_tensor(model_output.shape, key=key, dtype=jnp.float32)
            renoised = (alpha_prod_t_prev / alpha_prod_s) ** 0.5 * pred_noised + (
                1 - alpha_prod_t_prev / alpha_prod_s
            ) ** 0.5 * variance_noise.astype(jnp.float32)
            prev_sample = jnp.where(idx != S - 1, renoised, pred_noised)
        else:
            prev_sample = pred_noised

        prev_sample = prev_sample.astype(model_output.dtype)
        pred_noised = pred_noised.astype(model_output.dtype)
        if not return_dict:
            return (prev_sample, pred_noised)
        return TCDSchedulerOutput(prev_sample=prev_sample, pred_noised_sample=pred_noised, state=state)

    def add_noise(self, state, original_samples, noise, timesteps):
        acp = state.alphas_cumprod.astype(original_samples.dtype)
        a = broadcast_to_left(acp[timesteps] ** 0.5, original_samples.ndim)
        b = broadcast_to_left((1 - acp[timesteps]) ** 0.5, original_samples.ndim)
        return a * original_samples + b * noise

    def __len__(self):
        return self.config.num_train_timesteps
