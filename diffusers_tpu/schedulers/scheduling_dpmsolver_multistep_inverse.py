"""Inverse DPM-Solver++ multistep — noise-ward integration for inversion.

Numerics follow the reference
(`/root/reference/src/diffusers/schedulers/scheduling_dpmsolver_multistep_inverse.py:283`
DPMSolverMultistepInverseScheduler): the schedule runs clean→noisy —
ASCENDING integer timesteps `linspace(0, noisiest, N+1)[:-1]` (or
leading/trailing analogues), a sigma ladder that ends at `sigma_max` of the
noisiest timestep instead of 0 — while the multistep update math (`step`
`:1017`) is identical to the forward solver and is inherited from our
functional `DPMSolverMultistepScheduler`.

Used for DiffEdit / LEDITS++-style latent inversion.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from .scheduling_dpmsolver_multistep import (
    DPMSolverMultistepScheduler,
    DPMSolverMultistepSchedulerState,
)
from .sigma_utils import convert_to_beta, convert_to_exponential, convert_to_karras, sigma_to_t

DPMSolverMultistepInverseSchedulerState = DPMSolverMultistepSchedulerState


class DPMSolverMultistepInverseScheduler(DPMSolverMultistepScheduler):
    def set_timesteps(
        self,
        num_inference_steps: Optional[int] = None,
        mu: Optional[float] = None,
        timesteps: Optional[List[int]] = None,
        sample_shape: Optional[tuple] = None,
        dtype=jnp.float32,
    ) -> DPMSolverMultistepSchedulerState:
        clipped_idx = int(np.searchsorted(np.flip(self.lambda_t), self.config.lambda_min_clipped))
        noisiest = self.config.num_train_timesteps - 1 - clipped_idx
        self.noisiest_timestep = noisiest

        if timesteps is not None:
            ts = np.array(timesteps).astype(np.int64)
        elif self.config.timestep_spacing == "linspace":
            ts = np.linspace(0, noisiest, num_inference_steps + 1).round()[:-1].copy().astype(np.int64)
        elif self.config.timestep_spacing == "leading":
            step_ratio = (noisiest + 1) // (num_inference_steps + 1)
            ts = (np.arange(0, num_inference_steps + 1) * step_ratio).round()[:-1].copy().astype(np.int64)
            ts += self.config.steps_offset
        elif self.config.timestep_spacing == "trailing":
            step_ratio = self.config.num_train_timesteps / num_inference_steps
            ts = np.arange(noisiest + 1, 0, -step_ratio).round()[::-1].copy().astype(np.int64)
            ts -= 1
        else:
            raise ValueError(f"unsupported timestep_spacing {self.config.timestep_spacing}")

        sigmas_full = np.array(((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5)
        log_sigmas = np.log(sigmas_full)
        if self.config.use_karras_sigmas:
            sigmas = convert_to_karras(sigmas_full.copy(), num_inference_steps)
            ts = np.array([sigma_to_t(s, log_sigmas) for s in sigmas]).round().astype(np.int64)
            sigmas = np.concatenate([sigmas, sigmas[-1:]]).astype(np.float32)
        elif self.config.use_exponential_sigmas:
            sigmas = convert_to_exponential(sigmas_full.copy(), num_inference_steps)
            ts = np.array([sigma_to_t(s, log_sigmas) for s in sigmas])
            sigmas = np.concatenate([sigmas, sigmas[-1:]]).astype(np.float32)
        elif self.config.use_beta_sigmas:
            sigmas = convert_to_beta(sigmas_full.copy(), num_inference_steps)
            ts = np.array([sigma_to_t(s, log_sigmas) for s in sigmas])
            sigmas = np.concatenate([sigmas, sigmas[-1:]]).astype(np.float32)
        elif self.config.use_flow_sigmas:
            flow_shift = self.config.flow_shift if mu is None else float(np.exp(mu))
            alphas = np.linspace(1, 1 / self.config.num_train_timesteps, num_inference_steps + 1)
            sigmas = 1.0 - alphas
            sigmas = np.flip(flow_shift * sigmas / (1 + (flow_shift - 1) * sigmas))[:-1].copy()
            ts = (sigmas * self.config.num_train_timesteps).copy()
            sigmas = np.concatenate([sigmas, sigmas[-1:]]).astype(np.float32)
        else:
            sigmas = np.interp(ts, np.arange(0, len(sigmas_full)), sigmas_full)
            sigma_max = float(((1 - self.alphas_cumprod[noisiest]) / self.alphas_cumprod[noisiest]) ** 0.5)
            sigmas = np.concatenate([sigmas, [sigma_max]]).astype(np.float32)

        # drop duplicate timesteps (num_inference_steps == num_train_timesteps)
        _, unique_indices = np.unique(ts, return_index=True)
        ts = ts[np.sort(unique_indices)]

        model_outputs = None
        if sample_shape is not None:
            model_outputs = jnp.zeros((self.config.solver_order, *sample_shape), jnp.float32)
        return DPMSolverMultistepSchedulerState(
            timesteps=jnp.asarray(ts, jnp.int32),
            sigmas=jnp.asarray(sigmas, jnp.float32),
            alphas_cumprod=jnp.asarray(self.alphas_cumprod, jnp.float32),
            step_index=jnp.asarray(0, jnp.int32),
            model_outputs=model_outputs,
            init_noise_sigma=1.0,
            num_inference_steps=len(ts),
        )
