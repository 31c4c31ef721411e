"""DEIS multistep sampler (log-rho variant) — functional TPU-native.

Numerics follow the reference `scheduling_deis_multistep.py`: exponential
integrator over epsilon predictions with log-rho polynomial coefficients;
orders 1–2 (default configs use 2).
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


@flax.struct.dataclass
class DEISMultistepSchedulerState:
    timesteps: jax.Array
    sigmas: jax.Array  # [S+1]
    alphas_cumprod: jax.Array
    step_index: jax.Array
    model_outputs: Optional[jax.Array]  # converted-epsilon history [2, *shape]
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class DEISMultistepSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[DEISMultistepSchedulerState] = None


class DEISMultistepScheduler(SchedulerMixin, ConfigMixin):
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
        solver_order: int = 2,
        prediction_type: str = "epsilon",
        thresholding: bool = False,
        dynamic_thresholding_ratio: float = 0.995,
        sample_max_value: float = 1.0,
        algorithm_type: str = "deis",
        solver_type: str = "logrho",
        lower_order_final: bool = True,
        timestep_spacing: str = "linspace",
        steps_offset: int = 0,
    ):
        if algorithm_type != "deis" or solver_type != "logrho":
            raise NotImplementedError("only the log-rho deis variant is implemented (matches reference default)")
        if solver_order > 2:
            raise NotImplementedError("solver_order > 2 not implemented")
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end, trained_betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0)
        self.init_noise_sigma = 1.0

    def set_timesteps(self, num_inference_steps: int, sample_shape: Optional[tuple] = None) -> DEISMultistepSchedulerState:
        T = self.config.num_train_timesteps
        if self.config.timestep_spacing == "linspace":
            ts = np.linspace(0, T - 1, num_inference_steps + 1).round()[::-1][:-1].copy().astype(np.int64)
        elif self.config.timestep_spacing == "leading":
            step_ratio = T // (num_inference_steps + 1)
            ts = (np.arange(0, num_inference_steps + 1) * step_ratio).round()[::-1][:-1].copy().astype(np.int64)
            ts += self.config.steps_offset
        elif self.config.timestep_spacing == "trailing":
            step_ratio = T / num_inference_steps
            ts = np.arange(T, 0, -step_ratio).round().copy().astype(np.int64)
            ts -= 1
        else:
            raise ValueError(f"unsupported timestep_spacing {self.config.timestep_spacing}")

        sigmas_full = np.array(((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5)
        sigmas = np.interp(ts, np.arange(0, len(sigmas_full)), sigmas_full)
        # reference appends sigma_min (not zero) as the terminal sigma
        sigmas = np.concatenate([sigmas, [float(sigmas_full[0])]]).astype(np.float32)

        model_outputs = None
        if sample_shape is not None:
            model_outputs = jnp.zeros((2, *sample_shape), dtype=jnp.float32)

        return DEISMultistepSchedulerState(
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            sigmas=jnp.asarray(sigmas, dtype=jnp.float32),
            alphas_cumprod=jnp.asarray(self.alphas_cumprod, dtype=jnp.float32),
            step_index=jnp.asarray(0, dtype=jnp.int32),
            model_outputs=model_outputs,
            num_inference_steps=num_inference_steps,
        )

    def prepare(self, state, sample):
        if state.model_outputs is not None:
            return state
        return state.replace(model_outputs=jnp.zeros((2, *sample.shape), dtype=jnp.float32))

    def scale_model_input(self, state, sample, timestep=None):
        return sample

    def _sigma_to_alpha_sigma_t(self, sigma):
        alpha_t = 1 / ((sigma**2 + 1) ** 0.5)
        return alpha_t, sigma * alpha_t

    def _threshold_sample(self, sample):
        dtype = sample.dtype
        flat = sample.astype(jnp.float32).reshape(sample.shape[0], -1)
        s = jnp.quantile(jnp.abs(flat), self.config.dynamic_thresholding_ratio, axis=1)
        s = jnp.clip(s, 1, self.config.sample_max_value)[:, None]
        flat = jnp.clip(flat, -s, s) / s
        return flat.reshape(sample.shape).astype(dtype)

    def convert_model_output(self, state, model_output, sample, idx):
        """→ epsilon (reference convert_model_output, deis path)."""
        sigma = state.sigmas[idx]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma)
        if self.config.prediction_type == "epsilon":
            x0 = (sample - sigma_t * model_output) / alpha_t
        elif self.config.prediction_type == "sample":
            x0 = model_output
        elif self.config.prediction_type == "v_prediction":
            x0 = alpha_t * sample - sigma_t * model_output
        else:
            raise ValueError(f"unsupported prediction_type {self.config.prediction_type}")
        if self.config.thresholding:
            x0 = self._threshold_sample(x0)
        return (sample - alpha_t * x0) / jnp.maximum(sigma_t, 1e-12)

    def step(self, state, model_output, timestep, sample, return_dict: bool = True):
        state = self.prepare(state, sample)
        idx = state.step_index
        S = state.timesteps.shape[0]

        sample_f = sample.astype(jnp.float32)
        converted = self.convert_model_output(state, model_output.astype(jnp.float32), sample_f, idx)
        model_outputs = jnp.concatenate([state.model_outputs[1:], converted[None]], axis=0)

        sigma_t_raw, sigma_s0_raw = state.sigmas[idx + 1], state.sigmas[idx]
        sigma_s1_raw = state.sigmas[jnp.maximum(idx - 1, 0)]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma_t_raw)
        alpha_s0, sigma_s0 = self._sigma_to_alpha_sigma_t(sigma_s0_raw)
        alpha_s1, sigma_s1 = self._sigma_to_alpha_sigma_t(sigma_s1_raw)

        # first order (== DPM-Solver-1 on epsilon)
        lambda_t = jnp.log(alpha_t) - jnp.log(jnp.maximum(sigma_t, 1e-20))
        lambda_s = jnp.log(alpha_s0) - jnp.log(jnp.maximum(sigma_s0, 1e-20))
        h = lambda_t - lambda_s
        x_first = (alpha_t / alpha_s0) * sample_f - (sigma_t * (jnp.exp(h) - 1.0)) * converted

        # second order log-rho coefficients
        rho_t = sigma_t / jnp.maximum(alpha_t, 1e-20)
        rho_s0 = sigma_s0 / jnp.maximum(alpha_s0, 1e-20)
        rho_s1 = sigma_s1 / jnp.maximum(alpha_s1, 1e-20)

        def ind_fn(t, b, c):
            return t * (-jnp.log(jnp.maximum(c, 1e-20)) + jnp.log(jnp.maximum(t, 1e-20)) - 1) / (
                jnp.log(jnp.maximum(b, 1e-20)) - jnp.log(jnp.maximum(c, 1e-20))
            )

        coef1 = ind_fn(rho_t, rho_s0, rho_s1) - ind_fn(rho_s0, rho_s0, rho_s1)
        coef2 = ind_fn(rho_t, rho_s1, rho_s0) - ind_fn(rho_s0, rho_s1, rho_s0)
        m0, m1 = model_outputs[-1], model_outputs[-2]
        x_second = alpha_t * (sample_f / jnp.maximum(alpha_s0, 1e-20) + coef1 * m0 + coef2 * m1)

        lower_order_final = (idx == S - 1) & (self.config.lower_order_final & (S < 15))
        use_first = (idx < 1) | lower_order_final
        if self.config.solver_order == 1:
            prev_sample = x_first
        else:
            prev_sample = jnp.where(use_first, x_first, x_second)

        prev_sample = prev_sample.astype(model_output.dtype)
        new_state = state.replace(step_index=idx + 1, model_outputs=model_outputs)
        if not return_dict:
            return (prev_sample, new_state)
        return DEISMultistepSchedulerOutput(prev_sample=prev_sample, state=new_state)

    def add_noise(self, state, original_samples, noise, timesteps):
        schedule = state.timesteps
        ts = jnp.atleast_1d(jnp.asarray(timesteps))
        indices = jax.vmap(lambda t: index_for_timestep(schedule, t))(ts)
        sigma = state.sigmas[indices]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma)
        alpha_t = broadcast_to_left(alpha_t.astype(original_samples.dtype), original_samples.ndim)
        sigma_t = broadcast_to_left(sigma_t.astype(original_samples.dtype), original_samples.ndim)
        return alpha_t * original_samples + sigma_t * noise

    def __len__(self):
        return self.config.num_train_timesteps
