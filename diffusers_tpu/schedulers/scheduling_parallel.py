"""ParaDiGMS parallel-sampling schedulers (DDPM/DDIM batched steps).

Functional mirror of the reference `scheduling_ddpm_parallel.py:584` /
`scheduling_ddim_parallel.py:518`: `batch_step_no_noise` reverses the SDE for
a WINDOW of timesteps at once (noise is pre-sampled by the parallel sampler),
which is what lets ParaDiGMS trade FLOPs for wall-clock by iterating Picard
sweeps over many steps in one batched model call — a natural fit for the TPU,
where the window folds into the batch dimension of one big MXU matmul stream.

Implemented as thin extensions of the sequential DDPM/DDIM schedulers: the
sequential `step` (and all tables) are inherited; only the batched
deterministic update is added.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .scheduling_ddim import DDIMScheduler
from .scheduling_ddpm import DDPMScheduler


def _broadcast(t, ndim):
    return t.reshape(-1, *([1] * (ndim - 1)))


class DDPMParallelScheduler(DDPMScheduler):
    def batch_step_no_noise(self, state, model_output: jax.Array, timesteps: jax.Array, sample: jax.Array):
        """model_output/sample: [T·B, ...]; timesteps: [T·B] (one per row)."""
        T = self.config.num_train_timesteps
        S = state.num_inference_steps or T
        t = jnp.asarray(timesteps, dtype=jnp.int32)
        prev_t = t - T // S
        alphas_cumprod = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)

        if model_output.shape[1] == sample.shape[1] * 2 and self.config.variance_type in ("learned", "learned_range"):
            model_output, _ = jnp.split(model_output, 2, axis=1)

        nd = model_output.ndim
        alpha_prod_t = _broadcast(alphas_cumprod[t], nd)
        alpha_prod_t_prev = _broadcast(
            jnp.where(prev_t < 0, 1.0, alphas_cumprod[jnp.clip(prev_t, 0)]), nd
        )
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        current_alpha_t = alpha_prod_t / alpha_prod_t_prev
        current_beta_t = 1 - current_alpha_t

        sample_f = sample.astype(jnp.float32)
        mo = model_output.astype(jnp.float32)
        if self.config.prediction_type == "epsilon":
            pred_original = (sample_f - beta_prod_t**0.5 * mo) / alpha_prod_t**0.5
        elif self.config.prediction_type == "sample":
            pred_original = mo
        elif self.config.prediction_type == "v_prediction":
            pred_original = alpha_prod_t**0.5 * sample_f - beta_prod_t**0.5 * mo
        else:
            raise ValueError(f"unsupported prediction_type {self.config.prediction_type}")

        if self.config.clip_sample:
            r = self.config.clip_sample_range
            pred_original = jnp.clip(pred_original, -r, r)

        pred_original_coeff = (alpha_prod_t_prev**0.5 * current_beta_t) / beta_prod_t
        current_sample_coeff = current_alpha_t**0.5 * beta_prod_t_prev / beta_prod_t
        return (pred_original_coeff * pred_original + current_sample_coeff * sample_f).astype(sample.dtype)


class DDIMParallelScheduler(DDIMScheduler):
    def batch_step_no_noise(
        self, state, model_output: jax.Array, timesteps: jax.Array, sample: jax.Array, eta: float = 0.0
    ):
        assert eta == 0.0, "parallel DDIM requires eta == 0 (noise is pre-sampled by the sampler)"
        T = self.config.num_train_timesteps
        S = state.num_inference_steps
        t = jnp.asarray(timesteps, dtype=jnp.int32)
        prev_t = t - T // S
        alphas_cumprod = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)

        nd = model_output.ndim
        alpha_prod_t = _broadcast(alphas_cumprod[t], nd)
        alpha_prod_t_prev = _broadcast(
            jnp.where(prev_t < 0, 1.0, alphas_cumprod[jnp.clip(prev_t, 0)]), nd
        )
        beta_prod_t = 1 - alpha_prod_t

        sample_f = sample.astype(jnp.float32)
        mo = model_output.astype(jnp.float32)
        if self.config.prediction_type == "epsilon":
            pred_original = (sample_f - beta_prod_t**0.5 * mo) / alpha_prod_t**0.5
            pred_epsilon = mo
        elif self.config.prediction_type == "sample":
            pred_original = mo
            pred_epsilon = (sample_f - alpha_prod_t**0.5 * pred_original) / beta_prod_t**0.5
        elif self.config.prediction_type == "v_prediction":
            pred_original = alpha_prod_t**0.5 * sample_f - beta_prod_t**0.5 * mo
            pred_epsilon = alpha_prod_t**0.5 * mo + beta_prod_t**0.5 * sample_f
        else:
            raise ValueError(f"unsupported prediction_type {self.config.prediction_type}")

        if self.config.clip_sample:
            r = self.config.clip_sample_range
            pred_original = jnp.clip(pred_original, -r, r)

        pred_sample_direction = (1 - alpha_prod_t_prev) ** 0.5 * pred_epsilon
        return (alpha_prod_t_prev**0.5 * pred_original + pred_sample_direction).astype(sample.dtype)
