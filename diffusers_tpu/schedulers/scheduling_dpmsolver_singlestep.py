"""DPM-Solver singlestep sampler — functional TPU-native (orders 1–2).

Numerics follow the reference `scheduling_dpmsolver_singlestep.py`: a static
per-step order list (precomputed at set_timesteps and scanned alongside the
timesteps), first-order updates buffering the sample, second-order updates
integrating over the two-step interval [s1 → t].
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
class DPMSolverSinglestepSchedulerState:
    timesteps: jax.Array
    sigmas: jax.Array  # [S+1]
    order_list: jax.Array  # int32 [S]
    step_index: jax.Array
    model_outputs: Optional[jax.Array]  # [2, *shape]
    buffered_sample: Optional[jax.Array]
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class DPMSolverSinglestepSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[DPMSolverSinglestepSchedulerState] = None


class DPMSolverSinglestepScheduler(SchedulerMixin, ConfigMixin):
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
        algorithm_type: str = "dpmsolver++",
        solver_type: str = "midpoint",
        lower_order_final: bool = False,
        use_karras_sigmas: bool = False,
        final_sigmas_type: str = "zero",
        lambda_min_clipped: float = -float("inf"),
        variance_type: Optional[str] = None,
    ):
        if algorithm_type not in ("dpmsolver++",):
            raise NotImplementedError("only dpmsolver++ singlestep is implemented (reference default)")
        if solver_order > 2:
            raise NotImplementedError("solver_order > 2 not implemented")
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end, trained_betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0)
        alpha_t = np.sqrt(self.alphas_cumprod)
        sigma_t = np.sqrt(1 - self.alphas_cumprod)
        self.lambda_t = np.log(alpha_t) - np.log(sigma_t)
        self.init_noise_sigma = 1.0

    def get_order_list(self, steps: int) -> List[int]:
        order = self.config.solver_order
        # the reference forces lower_order_final when the terminal sigma is
        # zero (a second-order step into sigma=0 is ill-posed)
        lower_order_final = self.config.lower_order_final or self.config.final_sigmas_type == "zero"
        if lower_order_final:
            if order == 2:
                orders = [1, 2] * (steps // 2 - 1) + [1, 1] if steps % 2 == 0 else [1, 2] * (steps // 2) + [1]
            else:
                orders = [1] * steps
        else:
            orders = [1, 2] * (steps // 2) + ([1] if steps % 2 == 1 else []) if order == 2 else [1] * steps
        return orders

    def set_timesteps(self, num_inference_steps: int, sample_shape: Optional[tuple] = None) -> DPMSolverSinglestepSchedulerState:
        clipped_idx = int(np.searchsorted(np.flip(self.lambda_t), self.config.lambda_min_clipped))
        T = self.config.num_train_timesteps - clipped_idx
        ts = np.linspace(0, T - 1, num_inference_steps + 1).round()[::-1][:-1].copy().astype(np.int64)

        sigmas_full = np.array(((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5)
        log_sigmas = np.log(sigmas_full)
        if self.config.use_karras_sigmas:
            sigmas = np.flip(sigmas_full).copy()
            sigmas = convert_to_karras(sigmas, num_inference_steps)
            ts = np.array([sigma_to_t(s, log_sigmas) for s in sigmas]).round().astype(np.int64)
        else:
            sigmas = np.interp(ts, np.arange(0, len(sigmas_full)), sigmas_full)
        sigma_last = float(sigmas_full[0]) if self.config.final_sigmas_type == "sigma_min" else 0.0
        sigmas = np.concatenate([sigmas, [sigma_last]]).astype(np.float32)

        model_outputs = None
        buffered = None
        if sample_shape is not None:
            model_outputs = jnp.zeros((2, *sample_shape), dtype=jnp.float32)
            buffered = jnp.zeros(sample_shape, dtype=jnp.float32)

        return DPMSolverSinglestepSchedulerState(
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            sigmas=jnp.asarray(sigmas),
            order_list=jnp.asarray(self.get_order_list(num_inference_steps), dtype=jnp.int32),
            step_index=jnp.asarray(0, dtype=jnp.int32),
            model_outputs=model_outputs,
            buffered_sample=buffered,
            num_inference_steps=num_inference_steps,
        )

    def prepare(self, state, sample):
        if state.model_outputs is not None:
            return state
        return state.replace(
            model_outputs=jnp.zeros((2, *sample.shape), dtype=jnp.float32),
            buffered_sample=jnp.zeros(sample.shape, dtype=jnp.float32),
        )

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
        sigma = state.sigmas[idx]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma)
        if self.config.prediction_type == "epsilon":
            if self.config.variance_type in ("learned", "learned_range"):
                model_output = model_output[:, :3]
            x0 = (sample - sigma_t * model_output) / alpha_t
        elif self.config.prediction_type == "sample":
            x0 = model_output
        elif self.config.prediction_type == "v_prediction":
            x0 = alpha_t * sample - sigma_t * model_output
        else:
            raise ValueError(f"unsupported prediction_type {self.config.prediction_type}")
        if self.config.thresholding:
            x0 = self._threshold_sample(x0)
        return x0

    def step(self, state, model_output, timestep, sample, return_dict: bool = True):
        state = self.prepare(state, sample)
        idx = state.step_index

        sample_f = sample.astype(jnp.float32)
        converted = self.convert_model_output(state, model_output.astype(jnp.float32), sample_f, idx)
        model_outputs = jnp.concatenate([state.model_outputs[1:], converted[None]], axis=0)

        order = state.order_list[idx]
        buffered = jnp.where(order == 1, sample_f, state.buffered_sample)

        # first-order: interval [s0 → t] on the current sample
        def lam(s):
            a, st = self._sigma_to_alpha_sigma_t(s)
            return jnp.log(a) - jnp.log(jnp.maximum(st, 1e-20)), a, st

        lambda_t, alpha_t, sigma_t = lam(state.sigmas[idx + 1])
        lambda_s0, alpha_s0, sigma_s0 = lam(state.sigmas[idx])
        h1 = lambda_t - lambda_s0
        x_first = (sigma_t / sigma_s0) * sample_f - (alpha_t * (jnp.exp(-h1) - 1.0)) * converted

        # second-order: interval [s1 → t] on the buffered sample
        lambda_s1, alpha_s1, sigma_s1 = lam(state.sigmas[jnp.maximum(idx - 1, 0)])
        m0, m1 = model_outputs[-1], model_outputs[-2]
        h = lambda_t - lambda_s1
        h_0 = lambda_s0 - lambda_s1
        r0 = h_0 / h
        D0 = m1
        D1 = (m0 - m1) / jnp.where(r0 == 0, 1.0, r0)
        if self.config.solver_type == "midpoint":
            x_second = (
                (sigma_t / sigma_s1) * buffered
                - (alpha_t * (jnp.exp(-h) - 1.0)) * D0
                - 0.5 * (alpha_t * (jnp.exp(-h) - 1.0)) * D1
            )
        else:  # heun
            x_second = (
                (sigma_t / sigma_s1) * buffered
                - (alpha_t * (jnp.exp(-h) - 1.0)) * D0
                + (alpha_t * ((jnp.exp(-h) - 1.0) / h + 1.0)) * D1
            )

        prev_sample = jnp.where(order == 1, x_first, x_second).astype(model_output.dtype)
        new_state = state.replace(step_index=idx + 1, model_outputs=model_outputs, buffered_sample=buffered)
        if not return_dict:
            return (prev_sample, new_state)
        return DPMSolverSinglestepSchedulerOutput(prev_sample=prev_sample, state=new_state)

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
