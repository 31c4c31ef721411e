"""UnCLIP (karlo) scheduler — functional TPU-native.

Numerics follow the reference `scheduling_unclip.py`: squaredcos_cap_v2 betas,
(T−1)/(S−1) step ratio, dynamically recomputed beta for skipped steps
(β = 1 − ᾱ_t/ᾱ_prev), fixed_small_log or learned_range variance. `step` takes
the explicit `prev_timestep` like the reference (the Kandinsky/Karlo priors
pass it), with randomness through an explicit PRNG key / noise tensor.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import ConfigMixin, register_to_config
from ..utils import BaseOutput
from ..utils.jax_utils import randn_tensor
from .scheduling_utils import SchedulerMixin, make_beta_schedule


@flax.struct.dataclass
class UnCLIPSchedulerState:
    timesteps: jax.Array
    alphas_cumprod: jax.Array
    betas: jax.Array
    alphas: jax.Array
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class UnCLIPSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[UnCLIPSchedulerState] = None


class UnCLIPScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        variance_type: str = "fixed_small_log",
        clip_sample: bool = True,
        clip_sample_range: float = 1.0,
        prediction_type: str = "epsilon",
        beta_schedule: str = "squaredcos_cap_v2",
    ):
        if beta_schedule != "squaredcos_cap_v2":
            raise ValueError("UnCLIPScheduler only supports beta_schedule 'squaredcos_cap_v2'")
        self.betas = make_beta_schedule("squaredcos_cap_v2", num_train_timesteps, 0.0001, 0.02, None)
        self.alphas = 1.0 - self.betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0)
        self.init_noise_sigma = 1.0

    def set_timesteps(self, num_inference_steps: int) -> UnCLIPSchedulerState:
        # karlo step ratio: (T−1)/(S−1), endpoints included
        step_ratio = (self.config.num_train_timesteps - 1) / (num_inference_steps - 1)
        timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy().astype(np.int64)
        return UnCLIPSchedulerState(
            timesteps=jnp.asarray(timesteps, dtype=jnp.int32),
            alphas_cumprod=jnp.asarray(self.alphas_cumprod, dtype=jnp.float32),
            betas=jnp.asarray(self.betas, dtype=jnp.float32),
            alphas=jnp.asarray(self.alphas, dtype=jnp.float32),
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state, sample, timestep=None):
        return sample

    def _get_variance(self, state, t, prev_t, predicted_variance=None, variance_type=None):
        alpha_prod_t = state.alphas_cumprod[t]
        alpha_prod_t_prev = jnp.where(prev_t >= 0, state.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        beta = jnp.where(prev_t == t - 1, state.betas[t], 1 - alpha_prod_t / alpha_prod_t_prev)
        variance = beta_prod_t_prev / beta_prod_t * beta

        variance_type = variance_type or self.config.variance_type
        if variance_type == "fixed_small_log":
            return jnp.exp(0.5 * jnp.log(jnp.maximum(variance, 1e-20)))
        if variance_type == "learned_range":
            min_log = jnp.log(jnp.maximum(variance, 1e-20))
            max_log = jnp.log(jnp.maximum(beta, 1e-20))
            frac = (predicted_variance + 1) / 2
            return frac * max_log + (1 - frac) * min_log
        raise ValueError(f"unsupported variance_type {variance_type}")

    def step(
        self,
        state,
        model_output,
        timestep,
        sample,
        prev_timestep=None,
        key: Optional[jax.Array] = None,
        variance_noise: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        t = jnp.asarray(timestep, dtype=jnp.int32)

        predicted_variance = None
        if model_output.shape[1] == sample.shape[1] * 2 and self.config.variance_type == "learned_range":
            model_output, predicted_variance = jnp.split(model_output, 2, axis=1)

        prev_t = jnp.asarray(prev_timestep, dtype=jnp.int32) if prev_timestep is not None else t - 1

        sample_f = sample.astype(jnp.float32)
        mo = model_output.astype(jnp.float32)
        alpha_prod_t = state.alphas_cumprod[t]
        alpha_prod_t_prev = jnp.where(prev_t >= 0, state.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        beta = jnp.where(prev_t == t - 1, state.betas[t], 1 - alpha_prod_t / alpha_prod_t_prev)
        alpha = 1 - beta

        if self.config.prediction_type == "epsilon":
            pred_original = (sample_f - beta_prod_t**0.5 * mo) / alpha_prod_t**0.5
        elif self.config.prediction_type == "sample":
            pred_original = mo
        else:
            raise ValueError(f"unsupported prediction_type {self.config.prediction_type}")
        if self.config.clip_sample:
            r = self.config.clip_sample_range
            pred_original = jnp.clip(pred_original, -r, r)

        pred_original_coeff = (alpha_prod_t_prev**0.5 * beta) / beta_prod_t
        current_sample_coeff = alpha**0.5 * beta_prod_t_prev / beta_prod_t
        pred_prev = pred_original_coeff * pred_original + current_sample_coeff * sample_f

        if variance_noise is None:
            if key is None:
                raise ValueError("UnCLIPScheduler requires a PRNG key or variance_noise")
            variance_noise = randn_tensor(model_output.shape, key=key, dtype=jnp.float32)
        variance = self._get_variance(state, t, prev_t, predicted_variance=predicted_variance)
        if self.config.variance_type == "learned_range":
            variance = jnp.exp(0.5 * variance)
        pred_prev = pred_prev + jnp.where(t > 0, variance * variance_noise.astype(jnp.float32), 0.0)

        prev_sample = pred_prev.astype(sample.dtype)
        if not return_dict:
            return (prev_sample,)
        return UnCLIPSchedulerOutput(
            prev_sample=prev_sample, pred_original_sample=pred_original.astype(sample.dtype), state=state
        )

    def __len__(self):
        return self.config.num_train_timesteps
