"""KDPM2 ancestral sampler (k-diffusion DPM-2 with ancestral noise) —
functional TPU-native.

Numerics follow the reference `scheduling_k_dpm_2_ancestral_discrete.py`:
interleaved sigma ladders plus per-step (sigma_up, sigma_down) ancestral
split; two model evaluations per step; the noise for the ancestral term comes
from an explicit PRNG key (or a precomputed `variance_noise`), keeping the
step pure for `lax.scan`.
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
)
from .sigma_utils import convert_to_karras, sigma_to_t


@flax.struct.dataclass
class KDPM2AncestralDiscreteSchedulerState:
    timesteps: jax.Array  # [2S-1]
    sigmas: jax.Array
    sigmas_interpol: jax.Array
    sigmas_up: jax.Array
    sigmas_down: jax.Array
    step_index: jax.Array
    buffered_sample: Optional[jax.Array]
    init_noise_sigma: jax.Array
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class KDPM2AncestralDiscreteSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[KDPM2AncestralDiscreteSchedulerState] = None


class KDPM2AncestralDiscreteScheduler(SchedulerMixin, ConfigMixin):
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

    def set_timesteps(
        self, num_inference_steps: int, sample_shape: Optional[tuple] = None
    ) -> KDPM2AncestralDiscreteSchedulerState:
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
        sigmas_next = np.roll(sigmas, -1)
        sigmas_next[-1] = 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            sigmas_up = (sigmas_next**2 * (sigmas**2 - sigmas_next**2) / sigmas**2) ** 0.5
        sigmas_up[~np.isfinite(sigmas_up)] = 0.0
        sigmas_down = (np.maximum(sigmas_next**2 - sigmas_up**2, 0.0)) ** 0.5
        sigmas_down[-1] = 0.0

        with np.errstate(divide="ignore"):
            sigmas_interpol = np.exp(0.5 * (np.log(sigmas) + np.log(sigmas_down)))
        sigmas_interpol[~np.isfinite(sigmas_interpol)] = 0.0
        sigmas_interpol[-2:] = 0.0

        def interleave(x):
            return np.concatenate([x[:1], np.repeat(x[1:], 2), x[-1:]]).astype(np.float32)

        timesteps_interpol = np.array([sigma_to_t(s, log_sigmas) for s in sigmas_interpol]).astype(np.float32)
        interleaved = np.stack([timesteps_interpol[:-2], timesteps[1:]], axis=-1).reshape(-1)
        timesteps_i = np.concatenate([timesteps[:1], interleaved]).astype(np.float32)

        buffered = None
        if sample_shape is not None:
            buffered = jnp.zeros(sample_shape, dtype=jnp.float32)

        return KDPM2AncestralDiscreteSchedulerState(
            timesteps=jnp.asarray(timesteps_i),
            sigmas=jnp.asarray(interleave(sigmas)),
            sigmas_interpol=jnp.asarray(interleave(sigmas_interpol)),
            sigmas_up=jnp.asarray(interleave(sigmas_up)),
            sigmas_down=jnp.asarray(interleave(sigmas_down)),
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

    def scale_model_input(self, state, sample, timestep=None):
        idx = state.step_index
        in_first = (idx % 2) == 0
        sigma = jnp.where(in_first, state.sigmas[idx], state.sigmas_interpol[jnp.maximum(idx - 1, 0)])
        return sample / ((sigma**2 + 1) ** 0.5)

    def step(
        self,
        state,
        model_output,
        timestep,
        sample,
        key: Optional[jax.Array] = None,
        variance_noise: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        state = self.prepare(state, sample)
        idx = state.step_index
        in_first = (idx % 2) == 0
        prev_i = jnp.maximum(idx - 1, 0)

        sigma = jnp.where(in_first, state.sigmas[idx], state.sigmas[prev_i])
        sigma_interpol = jnp.where(in_first, state.sigmas_interpol[idx], state.sigmas_interpol[prev_i])
        sigma_up = state.sigmas_up[prev_i]
        sigma_down = state.sigmas_down[prev_i]

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
        dt = jnp.where(in_first, sigma_interpol - sigma, sigma_down - sigma)
        base = jnp.where(in_first, sample_f, state.buffered_sample)
        prev_sample = base + derivative * dt

        if variance_noise is None:
            if key is None:
                raise ValueError("KDPM2Ancestral requires a PRNG key or variance_noise for the ancestral step")
            variance_noise = randn_tensor(model_output.shape, key=key, dtype=jnp.float32)
        prev_sample = jnp.where(
            in_first, prev_sample, prev_sample + variance_noise.astype(jnp.float32) * sigma_up
        ).astype(model_output.dtype)

        new_state = state.replace(
            step_index=idx + 1,
            buffered_sample=jnp.where(in_first, sample_f, state.buffered_sample),
        )
        if not return_dict:
            return (prev_sample, new_state)
        return KDPM2AncestralDiscreteSchedulerOutput(
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
