"""DDPM (ancestral) sampler — functional TPU-native implementation.

Numerics mirror the reference `scheduling_ddpm.py` (DDPMScheduler:
`/root/reference/src/diffusers/schedulers/scheduling_ddpm.py:137`; step math
`:463-559`, formulas (6)/(7)/(15) of https://huggingface.co/papers/2006.11239),
re-expressed as a pure function over an immutable state so an entire sampling
run is one `lax.scan`.
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
    make_spaced_timesteps,
    rescale_zero_terminal_snr,
)


@flax.struct.dataclass
class DDPMSchedulerState:
    """Immutable sampling state. `timesteps` is the (descending) inference
    schedule; `alphas_cumprod` the full training ladder."""

    timesteps: jax.Array  # int32 [S]
    alphas_cumprod: jax.Array  # float32 [num_train_timesteps]
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class DDPMSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None


class DDPMScheduler(SchedulerMixin, ConfigMixin):
    """Denoising diffusion probabilistic models sampler (Ho et al. 2020)."""

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
        variance_type: str = "fixed_small",
        clip_sample: bool = True,
        prediction_type: str = "epsilon",
        thresholding: bool = False,
        dynamic_thresholding_ratio: float = 0.995,
        clip_sample_range: float = 1.0,
        sample_max_value: float = 1.0,
        timestep_spacing: str = "leading",
        steps_offset: int = 0,
        rescale_betas_zero_snr: bool = False,
    ):
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end, trained_betas)
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0)
        self.init_noise_sigma = 1.0

    # ------------------------------------------------------------------ API
    def set_timesteps(
        self,
        num_inference_steps: Optional[int] = None,
        timesteps: Optional[List[int]] = None,
    ) -> DDPMSchedulerState:
        """Build the inference-time state. Pure; returns a fresh state pytree."""
        if num_inference_steps is not None and timesteps is not None:
            raise ValueError("Can only pass one of `num_inference_steps` or `timesteps`.")
        if timesteps is not None:
            for i in range(1, len(timesteps)):
                if timesteps[i] >= timesteps[i - 1]:
                    raise ValueError("`timesteps` must be in descending order.")
            if timesteps[0] >= self.config.num_train_timesteps:
                raise ValueError("`timesteps` must start before num_train_timesteps.")
            ts = np.array(timesteps, dtype=np.int64)
            num_inference_steps = len(ts)
        elif num_inference_steps is not None:
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
        else:
            # Full training schedule (used by add_noise-only workflows and the
            # reference's full-loop golden tests).
            ts = np.arange(0, self.config.num_train_timesteps)[::-1].copy()
            num_inference_steps = None

        return DDPMSchedulerState(
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            alphas_cumprod=jnp.asarray(self.alphas_cumprod, dtype=jnp.float32),
            init_noise_sigma=1.0,
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state: DDPMSchedulerState, sample: jax.Array, timestep=None) -> jax.Array:
        return sample

    def _get_variance(self, alpha_prod_t, alpha_prod_t_prev, predicted_variance=None, variance_type=None):
        current_beta_t = 1 - alpha_prod_t / alpha_prod_t_prev
        variance = (1 - alpha_prod_t_prev) / (1 - alpha_prod_t) * current_beta_t
        variance = jnp.clip(variance, min=1e-20)

        if variance_type is None:
            variance_type = self.config.variance_type
        if variance_type == "fixed_small":
            return variance
        if variance_type == "fixed_small_log":
            return jnp.exp(0.5 * jnp.log(variance))
        if variance_type == "fixed_large":
            return current_beta_t
        if variance_type == "fixed_large_log":
            return jnp.log(current_beta_t)
        if variance_type == "learned":
            return predicted_variance
        if variance_type == "learned_range":
            min_log = jnp.log(variance)
            max_log = jnp.log(current_beta_t)
            frac = (predicted_variance + 1) / 2
            return frac * max_log + (1 - frac) * min_log
        raise ValueError(f"unknown variance_type {variance_type}")

    def _threshold_sample(self, sample: jax.Array) -> jax.Array:
        """Dynamic thresholding (https://huggingface.co/papers/2205.11487)."""
        dtype = sample.dtype
        batch_size = sample.shape[0]
        flat = sample.astype(jnp.float32).reshape(batch_size, -1)
        abs_sample = jnp.abs(flat)
        s = jnp.quantile(abs_sample, self.config.dynamic_thresholding_ratio, axis=1)
        s = jnp.clip(s, 1, self.config.sample_max_value)[:, None]
        flat = jnp.clip(flat, -s, s) / s
        return flat.reshape(sample.shape).astype(dtype)

    def step(
        self,
        state: DDPMSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        key: Optional[jax.Array] = None,
        variance_noise: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        """One reverse-diffusion step. `timestep` may be a python int or a
        traced scalar (e.g. scanned from `state.timesteps`)."""
        t = jnp.asarray(timestep, dtype=jnp.int32)
        idx = index_for_timestep(state.timesteps, t)
        num_steps = state.timesteps.shape[0]
        prev_t = jnp.where(idx == num_steps - 1, -1, state.timesteps[jnp.minimum(idx + 1, num_steps - 1)])

        if model_output.shape[1] == sample.shape[1] * 2 and self.config.variance_type in ("learned", "learned_range"):
            model_output, predicted_variance = jnp.split(model_output, 2, axis=1)
        else:
            predicted_variance = None

        # 1. alphas/betas at t and prev_t (fp32 gathers from the ladder)
        alpha_prod_t = state.alphas_cumprod[t]
        alpha_prod_t_prev = jnp.where(prev_t >= 0, state.alphas_cumprod[jnp.clip(prev_t, 0)], 1.0)
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        current_alpha_t = alpha_prod_t / alpha_prod_t_prev
        current_beta_t = 1 - current_alpha_t

        compute_dtype = jnp.promote_types(sample.dtype, jnp.float32)
        sample_f = sample.astype(compute_dtype)
        model_output_f = model_output.astype(compute_dtype)

        # 2. predicted x_0 (formula (15))
        if self.config.prediction_type == "epsilon":
            pred_original_sample = (sample_f - beta_prod_t**0.5 * model_output_f) / alpha_prod_t**0.5
        elif self.config.prediction_type == "sample":
            pred_original_sample = model_output_f
        elif self.config.prediction_type == "v_prediction":
            pred_original_sample = (alpha_prod_t**0.5) * sample_f - (beta_prod_t**0.5) * model_output_f
        else:
            raise ValueError(
                f"prediction_type {self.config.prediction_type} must be `epsilon`, `sample` or `v_prediction`"
            )

        # 3. clip/threshold x_0
        if self.config.thresholding:
            pred_original_sample = self._threshold_sample(pred_original_sample)
        elif self.config.clip_sample:
            pred_original_sample = jnp.clip(
                pred_original_sample, -self.config.clip_sample_range, self.config.clip_sample_range
            )

        # 4./5. posterior mean µ_t (formula (7))
        pred_original_sample_coeff = (alpha_prod_t_prev**0.5 * current_beta_t) / beta_prod_t
        current_sample_coeff = current_alpha_t**0.5 * beta_prod_t_prev / beta_prod_t
        pred_prev_sample = pred_original_sample_coeff * pred_original_sample + current_sample_coeff * sample_f

        # 6. ancestral noise (masked off at t == 0 instead of branching)
        if variance_noise is None and key is not None:
            variance_noise = randn_tensor(model_output.shape, key=key, dtype=compute_dtype)
        if variance_noise is not None:
            variance = self._get_variance(alpha_prod_t, alpha_prod_t_prev, predicted_variance)
            if self.config.variance_type == "fixed_small_log":
                sigma = variance
            elif self.config.variance_type == "learned_range":
                sigma = jnp.exp(0.5 * variance)
            else:
                sigma = variance**0.5
            pred_prev_sample = pred_prev_sample + jnp.where(t > 0, sigma, 0.0) * variance_noise.astype(compute_dtype)

        pred_prev_sample = pred_prev_sample.astype(sample.dtype)
        pred_original_sample = pred_original_sample.astype(sample.dtype)
        if not return_dict:
            return (pred_prev_sample, pred_original_sample)
        return DDPMSchedulerOutput(prev_sample=pred_prev_sample, pred_original_sample=pred_original_sample)

    def add_noise(self, state: DDPMSchedulerState, original_samples, noise, timesteps):
        alphas_cumprod = state.alphas_cumprod.astype(original_samples.dtype)
        sqrt_alpha_prod = broadcast_to_left(alphas_cumprod[timesteps] ** 0.5, original_samples.ndim)
        sqrt_one_minus = broadcast_to_left((1 - alphas_cumprod[timesteps]) ** 0.5, original_samples.ndim)
        return sqrt_alpha_prod * original_samples + sqrt_one_minus * noise

    def get_velocity(self, state: DDPMSchedulerState, sample, noise, timesteps):
        alphas_cumprod = state.alphas_cumprod.astype(sample.dtype)
        sqrt_alpha_prod = broadcast_to_left(alphas_cumprod[timesteps] ** 0.5, sample.ndim)
        sqrt_one_minus = broadcast_to_left((1 - alphas_cumprod[timesteps]) ** 0.5, sample.ndim)
        return sqrt_alpha_prod * noise - sqrt_one_minus * sample

    def __len__(self):
        return self.config.num_train_timesteps
