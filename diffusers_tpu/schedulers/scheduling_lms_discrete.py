"""LMS (linear multistep, k-LMS) sampler — functional TPU-native implementation.

Numerics follow the reference `scheduling_lms_discrete.py`
(`/root/reference/src/diffusers/schedulers/scheduling_lms_discrete.py`):
integrated-Lagrange-polynomial coefficients over the sigma ladder.

TPU design: the reference computes coefficients with scipy quadrature *inside*
`step`; every coefficient depends only on (sigmas, step index, order), so we
precompute the whole [S, order] table in numpy at `set_timesteps` and `step`
is pure gathers + FMA over the derivative history carried in the state.
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
)
from .sigma_utils import convert_to_karras, sigma_to_t


@flax.struct.dataclass
class LMSDiscreteSchedulerState:
    timesteps: jax.Array  # float32 [S]
    sigmas: jax.Array  # float32 [S+1]
    lms_coeffs: jax.Array  # float32 [S, order]
    derivatives: Optional[jax.Array]  # [order, *shape]
    step_index: jax.Array  # int32
    init_noise_sigma: jax.Array
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class LMSDiscreteSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[LMSDiscreteSchedulerState] = None


class LMSDiscreteScheduler(SchedulerMixin, ConfigMixin):
    _compatibles = [e.name for e in KarrasDiffusionSchedulers]
    order = 1
    lms_order = 4

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        trained_betas: Optional[List[float]] = None,
        use_karras_sigmas: bool = False,
        prediction_type: str = "epsilon",
        timestep_spacing: str = "linspace",
        steps_offset: int = 0,
    ):
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end, trained_betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0)

    @staticmethod
    def _lms_coeff(order: int, t: int, current_order: int, sigmas: np.ndarray) -> float:
        """∫_{σ_t}^{σ_{t+1}} Π_{k≠j} (τ−σ_{t−k})/(σ_{t−j}−σ_{t−k}) dτ (reference get_lms_coefficient)."""
        import scipy.integrate

        def lms_derivative(tau):
            prod = 1.0
            for k in range(order):
                if current_order == k:
                    continue
                prod *= (tau - sigmas[t - k]) / (sigmas[t - current_order] - sigmas[t - k])
            return prod

        return scipy.integrate.quad(lms_derivative, sigmas[t], sigmas[t + 1], epsrel=1e-4)[0]

    def set_timesteps(self, num_inference_steps: int, sample_shape: Optional[tuple] = None) -> LMSDiscreteSchedulerState:
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

        # precompute the LMS coefficient table (float64 quadrature)
        S = num_inference_steps
        coeffs = np.zeros((S, self.lms_order), dtype=np.float32)
        for i in range(S):
            order = min(i + 1, self.lms_order)
            for j in range(order):
                coeffs[i, j] = self._lms_coeff(order, i, j, sigmas.astype(np.float64))

        if self.config.timestep_spacing in ("linspace", "trailing"):
            init_noise_sigma = float(sigmas.max())
        else:
            init_noise_sigma = float((sigmas.max() ** 2 + 1) ** 0.5)

        derivatives = None
        if sample_shape is not None:
            derivatives = jnp.zeros((self.lms_order, *sample_shape), dtype=jnp.float32)

        return LMSDiscreteSchedulerState(
            timesteps=jnp.asarray(timesteps, dtype=jnp.float32),
            sigmas=jnp.asarray(sigmas, dtype=jnp.float32),
            lms_coeffs=jnp.asarray(coeffs),
            derivatives=derivatives,
            step_index=jnp.asarray(0, dtype=jnp.int32),
            init_noise_sigma=jnp.asarray(init_noise_sigma, dtype=jnp.float32),
            num_inference_steps=num_inference_steps,
        )

    def prepare(self, state: LMSDiscreteSchedulerState, sample: jax.Array) -> LMSDiscreteSchedulerState:
        if state.derivatives is not None:
            return state
        return state.replace(derivatives=jnp.zeros((self.lms_order, *sample.shape), dtype=jnp.float32))

    def scale_model_input(self, state, sample: jax.Array, timestep) -> jax.Array:
        idx = index_for_timestep(state.timesteps, jnp.asarray(timestep, dtype=state.timesteps.dtype))
        sigma = state.sigmas[idx]
        return sample / ((sigma**2 + 1) ** 0.5)

    def step(
        self,
        state: LMSDiscreteSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        return_dict: bool = True,
    ):
        state = self.prepare(state, sample)
        idx = state.step_index
        sigma = state.sigmas[idx]

        sample_f = sample.astype(jnp.float32)
        model_output_f = model_output.astype(jnp.float32)

        if self.config.prediction_type == "epsilon":
            pred_original_sample = sample_f - sigma * model_output_f
        elif self.config.prediction_type == "v_prediction":
            pred_original_sample = model_output_f * (-sigma / (sigma**2 + 1) ** 0.5) + (sample_f / (sigma**2 + 1))
        elif self.config.prediction_type == "sample":
            pred_original_sample = model_output_f
        else:
            raise ValueError(f"unsupported prediction_type {self.config.prediction_type}")

        derivative = (sample_f - pred_original_sample) / sigma
        # rotate history: newest at position 0 (matches coeff ordering below)
        derivatives = jnp.concatenate([derivative[None], state.derivatives[:-1]], axis=0)

        # prev = sample + Σ_j coeffs[idx, j] * derivatives[j]
        coeffs = state.lms_coeffs[idx]  # [order]
        update = jnp.tensordot(coeffs, derivatives, axes=1)
        prev_sample = (sample_f + update).astype(model_output.dtype)

        new_state = state.replace(step_index=idx + 1, derivatives=derivatives)
        if not return_dict:
            return (prev_sample, new_state)
        return LMSDiscreteSchedulerOutput(
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
