"""CogVideoX DPM-Solver++ (2M SDE) variant — functional TPU-native.

Numerics follow the reference `scheduling_dpm_cogvideox.py`
(`/root/reference/src/diffusers/schedulers/scheduling_dpm_cogvideox.py:134`
CogVideoXDPMScheduler): the SNR-shifted ᾱ ladder shared with the DDIM
variant, DPM-Solver++ multipliers from log-SNR differences with a
second-order correction using the PREVIOUS step's x̂₀ (`get_mult` :364),
and an SDE noise term `sqrt(1−ᾱ_prev)·sqrt(1−e^{−2h})`. The previous-x̂₀
carry and the PRNG key are explicit so `step` scans.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import ConfigMixin, register_to_config
from ..utils import BaseOutput
from ..utils.jax_utils import randn_tensor
from .scheduling_ddim import DDIMSchedulerState
from .scheduling_ddim_cogvideox import CogVideoXDDIMScheduler


@dataclass
class CogVideoXDPMSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[DDIMSchedulerState] = None


class CogVideoXDPMScheduler(CogVideoXDDIMScheduler):
    """Shares the ᾱ construction/set_timesteps with CogVideoXDDIMScheduler."""

    order = 1

    @staticmethod
    def get_variables(alpha_prod_t, alpha_prod_t_prev, alpha_prod_t_back=None):
        lamb = jnp.log((alpha_prod_t / (1 - alpha_prod_t)) ** 0.5)
        lamb_next = jnp.log((alpha_prod_t_prev / (1 - alpha_prod_t_prev)) ** 0.5)
        h = lamb_next - lamb
        if alpha_prod_t_back is not None:
            lamb_previous = jnp.log((alpha_prod_t_back / (1 - alpha_prod_t_back)) ** 0.5)
            r = (lamb - lamb_previous) / h
            return h, r, lamb, lamb_next
        return h, None, lamb, lamb_next

    @staticmethod
    def get_mult(h, r, alpha_prod_t, alpha_prod_t_prev, alpha_prod_t_back=None):
        mult1 = ((1 - alpha_prod_t_prev) / (1 - alpha_prod_t)) ** 0.5 * jnp.exp(-h)
        mult2 = jnp.expm1(-2 * h) * alpha_prod_t_prev**0.5
        if alpha_prod_t_back is not None:
            mult3 = 1 + 1 / (2 * r)
            mult4 = 1 / (2 * r)
            return mult1, mult2, mult3, mult4
        return mult1, mult2

    def step(
        self,
        state: DDIMSchedulerState,
        model_output: jax.Array,
        old_pred_original_sample: Optional[jax.Array],
        timestep,
        timestep_back,
        sample: jax.Array,
        key: Optional[jax.Array] = None,
        old_pred_valid: Optional[jax.Array] = None,
        return_dict: bool = False,
    ):
        """`timestep_back` is the PREVIOUS loop timestep (larger t); pass
        None (with old_pred_original_sample=None) on the first step."""
        prev_timestep = timestep - self.config.num_train_timesteps // state.num_inference_steps
        alpha_prod_t = state.alphas_cumprod[timestep]
        alpha_prod_t_prev = jnp.where(
            prev_timestep >= 0,
            state.alphas_cumprod[jnp.maximum(prev_timestep, 0)],
            state.final_alpha_cumprod,
        )
        alpha_prod_t_back = (
            state.alphas_cumprod[timestep_back] if timestep_back is not None else None
        )
        beta_prod_t = 1 - alpha_prod_t

        mo = model_output.astype(jnp.float32)
        x = sample.astype(jnp.float32)
        if self.config.prediction_type == "epsilon":
            x0 = (x - beta_prod_t**0.5 * mo) / alpha_prod_t**0.5
        elif self.config.prediction_type == "sample":
            x0 = mo
        elif self.config.prediction_type == "v_prediction":
            x0 = alpha_prod_t**0.5 * x - beta_prod_t**0.5 * mo
        else:
            raise ValueError(f"unknown prediction_type {self.config.prediction_type}")

        h, r, _, _ = self.get_variables(alpha_prod_t, alpha_prod_t_prev, alpha_prod_t_back)
        mult = self.get_mult(h, r, alpha_prod_t, alpha_prod_t_prev, alpha_prod_t_back)
        mult_noise = (1 - alpha_prod_t_prev) ** 0.5 * (1 - jnp.exp(-2 * h)) ** 0.5

        if key is None:
            key = jax.random.PRNGKey(0)
        noise = randn_tensor(sample.shape, key=key, dtype=jnp.float32)
        prev_sample = mult[0] * x - mult[1] * x0 + mult_noise * noise

        if old_pred_original_sample is not None and alpha_prod_t_back is not None:
            denoised_d = mult[2] * x0 - mult[3] * old_pred_original_sample.astype(jnp.float32)
            second_order = mult[0] * x - mult[1] * denoised_d + mult_noise * noise
            use_second = prev_timestep >= 0
            if old_pred_valid is not None:
                # scan-friendly gate: step 0 carries a zero old_pred that must
                # not contribute (reference passes None on the first step)
                use_second = use_second & (old_pred_valid > 0.5)
            prev_sample = jnp.where(use_second, second_order, prev_sample)

        prev_sample = prev_sample.astype(sample.dtype)
        if not return_dict:
            return (prev_sample, x0)
        return CogVideoXDPMSchedulerOutput(prev_sample=prev_sample, pred_original_sample=x0,
                                           state=state)


__all__ = ["CogVideoXDPMScheduler", "CogVideoXDPMSchedulerOutput"]
