"""KDPM2 discrete sampler (k-diffusion DPM-2) — functional TPU-native.

Numerics follow the reference `scheduling_k_dpm_2_discrete.py`: interleaved
sigma/sigma-interpol ladders (log-space midpoints), two model evaluations per
step (Euler predictor to the midpoint, then the DPM-2 correction), with the
buffered sample carried in the state.
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
    make_beta_schedule,
)
from .sigma_utils import convert_to_karras, sigma_to_t


@flax.struct.dataclass
class KDPM2DiscreteSchedulerState:
    timesteps: jax.Array  # [2S-1]
    sigmas: jax.Array  # [2S+1]
    sigmas_interpol: jax.Array  # [2S+1]
    step_index: jax.Array
    buffered_sample: Optional[jax.Array]
    init_noise_sigma: jax.Array
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class KDPM2DiscreteSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[KDPM2DiscreteSchedulerState] = None


class KDPM2DiscreteScheduler(SchedulerMixin, ConfigMixin):
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
        use_karras_sigmas: bool = False,
        prediction_type: str = "epsilon",
        timestep_spacing: str = "linspace",
        steps_offset: int = 0,
    ):
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end, trained_betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0)

    def set_timesteps(self, num_inference_steps: int, sample_shape: Optional[tuple] = None) -> KDPM2DiscreteSchedulerState:
        T = self.config.num_train_timesteps
        if self.config.timestep_spacing == "linspace":
            timesteps = np.linspace(0, T - 1, num_inference_steps, dtype=np.float32)[::-1].copy()
        elif self.config.timestep_spacing == "leading":
            step_ratio = T // num_inference_steps
            timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy().astype(np.float32)
            timesteps += self.config.steps_offset
        elif self.config.timestep_spacing == "trailing":
            step_ratio = T / num_inference_steps
            timesteps = (np.arange(T, 0, -step_ratio)).round().copy().astype(np.float32)
            timesteps -= 1
        else:
            raise ValueError(f"unsupported timestep_spacing {self.config.timestep_spacing}")

        sigmas_full = np.array(((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5)
        log_sigmas = np.log(sigmas_full)
        sigmas = np.interp(timesteps, np.arange(0, len(sigmas_full)), sigmas_full)
        if self.config.use_karras_sigmas:
            sigmas = convert_to_karras(sigmas, num_inference_steps)
            timesteps = np.array([sigma_to_t(s, log_sigmas) for s in sigmas]).round()

        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float64)
        # log-space midpoints: lerp(log σ_i, log σ_{i-1}, 0.5) with roll(1)
        rolled = np.roll(sigmas, 1)
        with np.errstate(divide="ignore"):
            sigmas_interpol = np.exp(0.5 * (np.log(sigmas) + np.log(rolled)))
        sigmas_interpol[~np.isfinite(sigmas_interpol)] = 0.0

        sigmas_i = np.concatenate([sigmas[:1], np.repeat(sigmas[1:], 2)[:-1], sigmas[-1:]]).astype(np.float32)
        interpol_i = np.concatenate(
            [sigmas_interpol[:1], np.repeat(sigmas_interpol[1:], 2)[:-1], sigmas_interpol[-1:]]
        ).astype(np.float32)

        timesteps_interpol = np.array([sigma_to_t(s, log_sigmas) for s in sigmas_interpol]).astype(np.float32)
        interleaved = np.stack([timesteps_interpol[1:-1], timesteps[1:]], axis=-1).reshape(-1)
        timesteps_i = np.concatenate([timesteps[:1], interleaved]).astype(np.float32)

        buffered = None
        if sample_shape is not None:
            buffered = jnp.zeros(sample_shape, dtype=jnp.float32)

        return KDPM2DiscreteSchedulerState(
            timesteps=jnp.asarray(timesteps_i),
            sigmas=jnp.asarray(sigmas_i),
            sigmas_interpol=jnp.asarray(interpol_i),
            step_index=jnp.asarray(0, dtype=jnp.int32),
            buffered_sample=buffered,
            init_noise_sigma=jnp.asarray(
                float(sigmas.max())
                if self.config.timestep_spacing in ("linspace", "trailing")
                else float((sigmas.max() ** 2 + 1) ** 0.5),
                dtype=jnp.float32,
            ),
            num_inference_steps=num_inference_steps,
        )

    def prepare(self, state, sample):
        if state.buffered_sample is not None:
            return state
        return state.replace(buffered_sample=jnp.zeros(sample.shape, dtype=jnp.float32))

    def scale_model_input(self, state, sample, timestep):
        idx = state.step_index
        in_first = (idx % 2) == 0
        sigma = jnp.where(in_first, state.sigmas[idx], state.sigmas_interpol[idx])
        return sample / ((sigma**2 + 1) ** 0.5)

    def step(self, state, model_output, timestep, sample, return_dict: bool = True):
        state = self.prepare(state, sample)
        idx = state.step_index
        in_first = (idx % 2) == 0

        sigma = jnp.where(in_first, state.sigmas[idx], state.sigmas[jnp.maximum(idx - 1, 0)])
        sigma_interpol = jnp.where(in_first, state.sigmas_interpol[idx + 1], state.sigmas_interpol[idx])
        sigma_next = jnp.where(in_first, state.sigmas[idx + 1], state.sigmas[idx])

        sample_f = sample.astype(jnp.float32)
        mo = model_output.astype(jnp.float32)
        sigma_input = jnp.where(in_first, sigma, sigma_interpol)
        if self.config.prediction_type == "epsilon":
            pred_original = sample_f - sigma_input * mo
        elif self.config.prediction_type == "v_prediction":
            pred_original = mo * (-sigma_input / (sigma_input**2 + 1) ** 0.5) + (sample_f / (sigma_input**2 + 1))
        else:
            raise ValueError(f"unsupported prediction_type {self.config.prediction_type}")

        deriv_first = (sample_f - pred_original) / jnp.where(sigma == 0, 1.0, sigma)
        deriv_second = (sample_f - pred_original) / jnp.where(sigma_interpol == 0, 1.0, sigma_interpol)
        derivative = jnp.where(in_first, deriv_first, deriv_second)
        dt = jnp.where(in_first, sigma_interpol - sigma, sigma_next - sigma)
        base = jnp.where(in_first, sample_f, state.buffered_sample)
        prev_sample = (base + derivative * dt).astype(model_output.dtype)

        new_state = state.replace(
            step_index=idx + 1,
            buffered_sample=jnp.where(in_first, sample_f, state.buffered_sample),
        )
        if not return_dict:
            return (prev_sample, new_state)
        return KDPM2DiscreteSchedulerOutput(
            prev_sample=prev_sample, pred_original_sample=pred_original.astype(model_output.dtype), state=new_state
        )

    def add_noise(self, state, original_samples, noise, timesteps):
        from .scheduling_utils import index_for_timestep

        schedule = state.timesteps
        ts = jnp.atleast_1d(jnp.asarray(timesteps, dtype=schedule.dtype))
        indices = jax.vmap(lambda t: index_for_timestep(schedule, t))(ts)
        sigma = broadcast_to_left(state.sigmas[indices].astype(original_samples.dtype), original_samples.ndim)
        return original_samples + noise * sigma

    def __len__(self):
        return self.config.num_train_timesteps
