"""DDIM sampler — functional TPU-native implementation.

Numerics follow the reference `scheduling_ddim.py`
(`/root/reference/src/diffusers/schedulers/scheduling_ddim.py:184` DDIMScheduler;
step `:384-515`, formulas (12)/(16) of https://huggingface.co/papers/2010.02502).
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
    make_beta_schedule,
    make_spaced_timesteps,
    rescale_zero_terminal_snr,
)


@flax.struct.dataclass
class DDIMSchedulerState:
    timesteps: jax.Array  # int32 [S]
    alphas_cumprod: jax.Array  # float32 [T]
    final_alpha_cumprod: jax.Array  # float32 scalar
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class DDIMSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[DDIMSchedulerState] = None


class DDIMScheduler(SchedulerMixin, ConfigMixin):
    """Denoising diffusion implicit models sampler (Song et al. 2020)."""

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
        clip_sample: bool = True,
        set_alpha_to_one: bool = True,
        steps_offset: int = 0,
        prediction_type: str = "epsilon",
        thresholding: bool = False,
        dynamic_thresholding_ratio: float = 0.995,
        clip_sample_range: float = 1.0,
        sample_max_value: float = 1.0,
        timestep_spacing: str = "leading",
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

    def set_timesteps(self, num_inference_steps: int) -> DDIMSchedulerState:
        if num_inference_steps > self.config.num_train_timesteps:
            raise ValueError(
                f"num_inference_steps ({num_inference_steps}) > num_train_timesteps "
                f"({self.config.num_train_timesteps})"
            )
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

    def scale_model_input(self, state: DDIMSchedulerState, sample: jax.Array, timestep=None) -> jax.Array:
        return sample

    def _threshold_sample(self, sample: jax.Array) -> jax.Array:
        dtype = sample.dtype
        batch_size = sample.shape[0]
        flat = sample.astype(jnp.float32).reshape(batch_size, -1)
        s = jnp.quantile(jnp.abs(flat), self.config.dynamic_thresholding_ratio, axis=1)
        s = jnp.clip(s, 1, self.config.sample_max_value)[:, None]
        flat = jnp.clip(flat, -s, s) / s
        return flat.reshape(sample.shape).astype(dtype)

    def step(
        self,
        state: DDIMSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        eta: float = 0.0,
        use_clipped_model_output: bool = False,
        key: Optional[jax.Array] = None,
        variance_noise: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        if state.num_inference_steps is None:
            raise ValueError("run `set_timesteps` before `step`")

        t = jnp.asarray(timestep, dtype=jnp.int32)
        # 1. previous timestep: t - T // S (reference scheduling_ddim.py:446)
        prev_t = t - self.config.num_train_timesteps // state.num_inference_steps

        # 2. alphas/betas
        alpha_prod_t = state.alphas_cumprod[t]
        alpha_prod_t_prev = jnp.where(prev_t >= 0, state.alphas_cumprod[jnp.clip(prev_t, 0)], state.final_alpha_cumprod)
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev

        compute_dtype = jnp.promote_types(sample.dtype, jnp.float32)
        sample_f = sample.astype(compute_dtype)
        model_output_f = model_output.astype(compute_dtype)

        # 3. predicted x_0 and epsilon
        if self.config.prediction_type == "epsilon":
            pred_original_sample = (sample_f - beta_prod_t**0.5 * model_output_f) / alpha_prod_t**0.5
            pred_epsilon = model_output_f
        elif self.config.prediction_type == "sample":
            pred_original_sample = model_output_f
            pred_epsilon = (sample_f - alpha_prod_t**0.5 * pred_original_sample) / beta_prod_t**0.5
        elif self.config.prediction_type == "v_prediction":
            pred_original_sample = (alpha_prod_t**0.5) * sample_f - (beta_prod_t**0.5) * model_output_f
            pred_epsilon = (alpha_prod_t**0.5) * model_output_f + (beta_prod_t**0.5) * sample_f
        else:
            raise ValueError(
                f"prediction_type {self.config.prediction_type} must be `epsilon`, `sample` or `v_prediction`"
            )

        # 4. clip/threshold x_0
        if self.config.thresholding:
            pred_original_sample = self._threshold_sample(pred_original_sample)
        elif self.config.clip_sample:
            pred_original_sample = jnp.clip(
                pred_original_sample, -self.config.clip_sample_range, self.config.clip_sample_range
            )

        # 5. variance σ_t² (formula (16)). XLA lowers fp32 division to
        # reciprocal-multiply, which can leave this epsilon-negative — clamp.
        # Skip entirely at eta == 0 (the common deterministic path).
        if eta != 0.0:
            variance = (beta_prod_t_prev / beta_prod_t) * (1 - alpha_prod_t / alpha_prod_t_prev)
            std_dev_t = eta * jnp.maximum(variance, 0.0) ** 0.5
        else:
            std_dev_t = 0.0

        if use_clipped_model_output:
            pred_epsilon = (sample_f - alpha_prod_t**0.5 * pred_original_sample) / beta_prod_t**0.5

        # 6. "direction pointing to x_t" (formula (12))
        pred_sample_direction = (1 - alpha_prod_t_prev - std_dev_t**2) ** 0.5 * pred_epsilon

        # 7. x_{t-1}
        prev_sample = alpha_prod_t_prev**0.5 * pred_original_sample + pred_sample_direction

        if eta > 0:
            if variance_noise is None and key is not None:
                variance_noise = randn_tensor(model_output.shape, key=key, dtype=compute_dtype)
            if variance_noise is None:
                raise ValueError("eta > 0 requires `key` or `variance_noise`")
            prev_sample = prev_sample + std_dev_t * variance_noise.astype(compute_dtype)

        prev_sample = prev_sample.astype(sample.dtype)
        pred_original_sample = pred_original_sample.astype(sample.dtype)
        if not return_dict:
            return (prev_sample, pred_original_sample)
        return DDIMSchedulerOutput(prev_sample=prev_sample, pred_original_sample=pred_original_sample, state=state)

    def add_noise(self, state: DDIMSchedulerState, original_samples, noise, timesteps):
        alphas_cumprod = state.alphas_cumprod.astype(original_samples.dtype)
        sqrt_alpha_prod = broadcast_to_left(alphas_cumprod[timesteps] ** 0.5, original_samples.ndim)
        sqrt_one_minus = broadcast_to_left((1 - alphas_cumprod[timesteps]) ** 0.5, original_samples.ndim)
        return sqrt_alpha_prod * original_samples + sqrt_one_minus * noise

    def get_velocity(self, state: DDIMSchedulerState, sample, noise, timesteps):
        alphas_cumprod = state.alphas_cumprod.astype(sample.dtype)
        sqrt_alpha_prod = broadcast_to_left(alphas_cumprod[timesteps] ** 0.5, sample.ndim)
        sqrt_one_minus = broadcast_to_left((1 - alphas_cumprod[timesteps]) ** 0.5, sample.ndim)
        return sqrt_alpha_prod * noise - sqrt_one_minus * sample

    def __len__(self):
        return self.config.num_train_timesteps
