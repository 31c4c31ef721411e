"""Euler (k-diffusion) sampler — functional TPU-native implementation.

Numerics follow the reference `scheduling_euler_discrete.py`
(`/root/reference/src/diffusers/schedulers/scheduling_euler_discrete.py:203`
EulerDiscreteScheduler; step math at `:631-731`). Sigma ladders are built in
numpy at `set_timesteps` time; `step` is a pure gather + FMA suitable for
`lax.scan`.
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
from .sigma_utils import convert_to_beta, convert_to_exponential, convert_to_karras, sigma_to_t


@flax.struct.dataclass
class EulerDiscreteSchedulerState:
    timesteps: jax.Array  # float32 [S]
    sigmas: jax.Array  # float32 [S+1]
    init_noise_sigma: jax.Array  # float32 scalar
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class EulerDiscreteSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[EulerDiscreteSchedulerState] = None


class EulerDiscreteScheduler(SchedulerMixin, ConfigMixin):
    """Euler method sampler following Karras et al. (2022) Algorithm 2."""

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
        interpolation_type: str = "linear",
        use_karras_sigmas: bool = False,
        use_exponential_sigmas: bool = False,
        use_beta_sigmas: bool = False,
        sigma_min: Optional[float] = None,
        sigma_max: Optional[float] = None,
        timestep_spacing: str = "linspace",
        timestep_type: str = "discrete",
        steps_offset: int = 0,
        rescale_betas_zero_snr: bool = False,
        final_sigmas_type: str = "zero",
    ):
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end, trained_betas)
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0)
        if rescale_betas_zero_snr:
            # close-to-0 sigma at the last step blows up 1/sqrt(acp); match reference clamp
            self.alphas_cumprod[-1] = 2**-24

    def _default_state_arrays(self):
        sigmas = (((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5)[::-1].copy()
        return sigmas

    def set_timesteps(
        self,
        num_inference_steps: Optional[int] = None,
        timesteps: Optional[List[int]] = None,
        sigmas: Optional[List[float]] = None,
    ) -> EulerDiscreteSchedulerState:
        if timesteps is not None and sigmas is not None:
            raise ValueError("Only one of `timesteps` or `sigmas` should be set.")
        if num_inference_steps is None and timesteps is None and sigmas is None:
            raise ValueError("Must pass one of `num_inference_steps`, `timesteps` or `sigmas`.")
        if num_inference_steps is not None and (timesteps is not None or sigmas is not None):
            raise ValueError("Can only pass one of `num_inference_steps` or `timesteps` or `sigmas`.")

        if num_inference_steps is None:
            num_inference_steps = len(timesteps) if timesteps is not None else len(sigmas) - 1

        if sigmas is not None:
            log_sigmas = np.log(np.array(((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5))
            sigmas = np.array(sigmas).astype(np.float32)
            timesteps = np.array([sigma_to_t(s, log_sigmas) for s in sigmas[:-1]])
        else:
            if timesteps is not None:
                timesteps = np.array(timesteps).astype(np.float32)
            else:
                if self.config.timestep_spacing == "linspace":
                    timesteps = np.linspace(
                        0, self.config.num_train_timesteps - 1, num_inference_steps, dtype=np.float32
                    )[::-1].copy()
                elif self.config.timestep_spacing == "leading":
                    step_ratio = self.config.num_train_timesteps // num_inference_steps
                    timesteps = (
                        (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy().astype(np.float32)
                    )
                    timesteps += self.config.steps_offset
                elif self.config.timestep_spacing == "trailing":
                    step_ratio = self.config.num_train_timesteps / num_inference_steps
                    timesteps = (np.arange(self.config.num_train_timesteps, 0, -step_ratio)).round().copy().astype(
                        np.float32
                    )
                    timesteps -= 1
                else:
                    raise ValueError(f"unsupported timestep_spacing {self.config.timestep_spacing}")

            sigmas_full = np.array(((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5)
            log_sigmas = np.log(sigmas_full)
            if self.config.interpolation_type == "linear":
                sigmas = np.interp(timesteps, np.arange(0, len(sigmas_full)), sigmas_full)
            elif self.config.interpolation_type == "log_linear":
                sigmas = np.exp(np.linspace(np.log(sigmas_full[-1]), np.log(sigmas_full[0]), num_inference_steps + 1))
            else:
                raise ValueError(f"unsupported interpolation_type {self.config.interpolation_type}")

            if self.config.use_karras_sigmas:
                sigmas = convert_to_karras(sigmas, num_inference_steps, self.config.sigma_min, self.config.sigma_max)
                timesteps = np.array([sigma_to_t(s, log_sigmas) for s in sigmas])
            elif self.config.use_exponential_sigmas:
                sigmas = convert_to_exponential(
                    sigmas, num_inference_steps, self.config.sigma_min, self.config.sigma_max
                )
                timesteps = np.array([sigma_to_t(s, log_sigmas) for s in sigmas])
            elif self.config.use_beta_sigmas:
                sigmas = convert_to_beta(sigmas, num_inference_steps, self.config.sigma_min, self.config.sigma_max)
                timesteps = np.array([sigma_to_t(s, log_sigmas) for s in sigmas])

            if self.config.final_sigmas_type == "sigma_min":
                sigma_last = float(((1 - self.alphas_cumprod[0]) / self.alphas_cumprod[0]) ** 0.5)
            elif self.config.final_sigmas_type == "zero":
                sigma_last = 0
            else:
                raise ValueError(f"final_sigmas_type must be 'zero' or 'sigma_min', got {self.config.final_sigmas_type}")
            sigmas = np.concatenate([sigmas, [sigma_last]]).astype(np.float32)

        if self.config.timestep_type == "continuous" and self.config.prediction_type == "v_prediction":
            timesteps = np.array([0.25 * np.log(s) for s in sigmas[:-1]], dtype=np.float32)

        sigmas = np.asarray(sigmas, dtype=np.float32)
        if self.config.timestep_spacing in ("linspace", "trailing"):
            init_noise_sigma = float(sigmas.max())
        else:
            init_noise_sigma = float((sigmas.max() ** 2 + 1) ** 0.5)

        return EulerDiscreteSchedulerState(
            timesteps=jnp.asarray(timesteps, dtype=jnp.float32),
            sigmas=jnp.asarray(sigmas, dtype=jnp.float32),
            init_noise_sigma=jnp.asarray(init_noise_sigma, dtype=jnp.float32),
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state: EulerDiscreteSchedulerState, sample: jax.Array, timestep) -> jax.Array:
        idx = index_for_timestep(state.timesteps, jnp.asarray(timestep, dtype=state.timesteps.dtype))
        sigma = state.sigmas[idx]
        return sample / ((sigma**2 + 1) ** 0.5)

    def step(
        self,
        state: EulerDiscreteSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        s_churn: float = 0.0,
        s_tmin: float = 0.0,
        s_tmax: float = float("inf"),
        s_noise: float = 1.0,
        key: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        idx = index_for_timestep(state.timesteps, jnp.asarray(timestep, dtype=state.timesteps.dtype))
        sigma = state.sigmas[idx]

        compute_dtype = jnp.promote_types(sample.dtype, jnp.float32)
        sample_f = sample.astype(compute_dtype)
        model_output_f = model_output.astype(compute_dtype)

        if s_churn > 0:
            gamma_val = min(s_churn / (state.sigmas.shape[0] - 1), 2**0.5 - 1)
            gamma = jnp.where((s_tmin <= sigma) & (sigma <= s_tmax), gamma_val, 0.0)
            sigma_hat = sigma * (gamma + 1)
            if key is None:
                raise ValueError("s_churn > 0 requires a PRNG key")
            eps = randn_tensor(model_output.shape, key=key, dtype=compute_dtype) * s_noise
            sample_f = sample_f + eps * jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
        else:
            sigma_hat = sigma

        # 1. predicted x_0
        if self.config.prediction_type in ("original_sample", "sample"):
            pred_original_sample = model_output_f
        elif self.config.prediction_type == "epsilon":
            pred_original_sample = sample_f - sigma_hat * model_output_f
        elif self.config.prediction_type == "v_prediction":
            pred_original_sample = model_output_f * (-sigma / (sigma**2 + 1) ** 0.5) + (sample_f / (sigma**2 + 1))
        else:
            raise ValueError(f"prediction_type {self.config.prediction_type} must be epsilon/sample/v_prediction")

        # 2. Euler ODE step
        derivative = (sample_f - pred_original_sample) / sigma_hat
        dt = state.sigmas[idx + 1] - sigma_hat
        prev_sample = (sample_f + derivative * dt).astype(model_output.dtype)

        if not return_dict:
            return (prev_sample, pred_original_sample.astype(model_output.dtype))
        return EulerDiscreteSchedulerOutput(
            prev_sample=prev_sample,
            pred_original_sample=pred_original_sample.astype(model_output.dtype),
            state=state,
        )

    def add_noise(self, state: EulerDiscreteSchedulerState, original_samples, noise, timesteps):
        # timesteps here are schedule values; map each to its sigma
        schedule = state.timesteps
        ts = jnp.atleast_1d(jnp.asarray(timesteps, dtype=schedule.dtype))
        indices = jax.vmap(lambda t: index_for_timestep(schedule, t))(ts)
        sigma = broadcast_to_left(state.sigmas[indices].astype(original_samples.dtype), original_samples.ndim)
        return original_samples + noise * sigma

    def get_velocity(self, state, sample, noise, timesteps):
        schedule = state.timesteps
        ts = jnp.atleast_1d(jnp.asarray(timesteps, dtype=schedule.dtype))
        indices = jax.vmap(lambda t: index_for_timestep(schedule, t))(ts)
        sigma = broadcast_to_left(state.sigmas[indices].astype(sample.dtype), sample.ndim)
        alpha_prod = 1 / (sigma**2 + 1)
        sqrt_alpha_prod = alpha_prod**0.5
        sqrt_one_minus = (1 - alpha_prod) ** 0.5
        return sqrt_alpha_prod * noise - sqrt_one_minus * sample

    def __len__(self):
        return self.config.num_train_timesteps
