"""Parallel-sampling scheduler variants (ParaDiGMS, arXiv:2305.16317).

Behavioral mirror of the reference `schedulers/scheduling_ddim_parallel.py:518`
and `scheduling_ddpm_parallel.py:584`: `batch_step_no_noise` reverses the SDE
for a WINDOW of timesteps at once (per-sample timesteps on the batch axis)
without injecting noise — the ParaDiGMS pipeline pre-samples all noise outside
the Picard iteration. `get_variance` exposes the per-timestep noise magnitude
used for the pipeline's error tolerance.
"""

from __future__ import annotations

import jax.numpy as jnp

from .scheduling_ddim import DDIMScheduler, DDIMSchedulerState
from .scheduling_ddpm import DDPMScheduler, DDPMSchedulerState


def _left(x, ndim):
    return x.reshape(x.shape[0], *([1] * (ndim - 1)))


class DDIMParallelScheduler(DDIMScheduler):
    _is_ode_scheduler = True

    def get_variance(self, state: DDIMSchedulerState, timestep):
        t = jnp.asarray(timestep, jnp.int32)
        prev_t = t - self.config.num_train_timesteps // state.num_inference_steps
        alpha_prod_t = state.alphas_cumprod[t]
        alpha_prod_t_prev = jnp.where(prev_t >= 0, state.alphas_cumprod[jnp.clip(prev_t, 0)],
                                      state.final_alpha_cumprod)
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        return (beta_prod_t_prev / beta_prod_t) * (1 - alpha_prod_t / alpha_prod_t_prev)

    def batch_step_no_noise(self, state: DDIMSchedulerState, model_output, timesteps, sample,
                            eta: float = 0.0):
        """DDIM update for per-sample timesteps, no noise (reference `:518`)."""
        assert eta == 0.0
        t = jnp.asarray(timesteps, jnp.int32)
        prev_t = t - self.config.num_train_timesteps // state.num_inference_steps
        alpha_prod_t = _left(state.alphas_cumprod[t], sample.ndim)
        alpha_prod_t_prev = _left(
            jnp.where(prev_t >= 0, state.alphas_cumprod[jnp.clip(prev_t, 0)], state.final_alpha_cumprod),
            sample.ndim)
        beta_prod_t = 1 - alpha_prod_t

        x = sample.astype(jnp.float32)
        eps_in = model_output.astype(jnp.float32)
        if self.config.prediction_type == "epsilon":
            x0 = (x - beta_prod_t**0.5 * eps_in) / alpha_prod_t**0.5
            eps = eps_in
        elif self.config.prediction_type == "sample":
            x0 = eps_in
            eps = (x - alpha_prod_t**0.5 * x0) / beta_prod_t**0.5
        elif self.config.prediction_type == "v_prediction":
            x0 = alpha_prod_t**0.5 * x - beta_prod_t**0.5 * eps_in
            eps = alpha_prod_t**0.5 * eps_in + beta_prod_t**0.5 * x
        else:
            raise ValueError(self.config.prediction_type)
        if self.config.thresholding:
            x0 = self._threshold_sample(x0)
        elif self.config.clip_sample:
            x0 = jnp.clip(x0, -self.config.clip_sample_range, self.config.clip_sample_range)
        direction = (1 - alpha_prod_t_prev) ** 0.5 * eps
        return (alpha_prod_t_prev**0.5 * x0 + direction).astype(sample.dtype)


class DDPMParallelScheduler(DDPMScheduler):
    _is_ode_scheduler = False

    def get_variance(self, state: DDPMSchedulerState, timestep):
        t = jnp.asarray(timestep, jnp.int32)
        prev_t = t - self.config.num_train_timesteps // len(state.timesteps)
        alpha_prod_t = state.alphas_cumprod[t]
        alpha_prod_t_prev = jnp.where(prev_t >= 0, state.alphas_cumprod[jnp.clip(prev_t, 0)], 1.0)
        current_beta_t = 1 - alpha_prod_t / alpha_prod_t_prev
        variance = (1 - alpha_prod_t_prev) / (1 - alpha_prod_t) * current_beta_t
        return jnp.clip(variance, 1e-20)

    def batch_step_no_noise(self, state: DDPMSchedulerState, model_output, timesteps, sample):
        """DDPM posterior MEAN for per-sample timesteps (reference
        scheduling_ddpm_parallel.py:584; noise is pipeline-presampled)."""
        t = jnp.asarray(timesteps, jnp.int32)
        prev_t = t - self.config.num_train_timesteps // len(state.timesteps)
        alpha_prod_t = _left(state.alphas_cumprod[t], sample.ndim)
        alpha_prod_t_prev = _left(
            jnp.where(prev_t >= 0, state.alphas_cumprod[jnp.clip(prev_t, 0)], 1.0), sample.ndim)
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        current_alpha_t = alpha_prod_t / alpha_prod_t_prev
        current_beta_t = 1 - current_alpha_t

        x = sample.astype(jnp.float32)
        eps_in = model_output.astype(jnp.float32)
        if self.config.prediction_type == "epsilon":
            x0 = (x - beta_prod_t**0.5 * eps_in) / alpha_prod_t**0.5
        elif self.config.prediction_type == "sample":
            x0 = eps_in
        elif self.config.prediction_type == "v_prediction":
            x0 = alpha_prod_t**0.5 * x - beta_prod_t**0.5 * eps_in
        else:
            raise ValueError(self.config.prediction_type)
        if self.config.thresholding:
            x0 = self._threshold_sample(x0)
        elif self.config.clip_sample:
            x0 = jnp.clip(x0, -self.config.clip_sample_range, self.config.clip_sample_range)
        coef_x0 = (alpha_prod_t_prev**0.5 * current_beta_t) / beta_prod_t
        coef_xt = current_alpha_t**0.5 * beta_prod_t_prev / beta_prod_t
        return (coef_x0 * x0 + coef_xt * x).astype(sample.dtype)


__all__ = ["DDIMParallelScheduler", "DDPMParallelScheduler"]
