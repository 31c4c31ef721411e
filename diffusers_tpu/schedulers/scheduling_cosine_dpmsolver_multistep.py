"""Cosine-noise SDE-DPM-Solver++ multistep (Stable Audio's sampler) —
functional TPU-native.

Numerics follow the reference `scheduling_cosine_dpmsolver_multistep.py:28`
(CosineDPMSolverMultistepScheduler): EDM preconditioning with
`c_noise = atan(sigma)/pi*2` timesteps (`:182` precondition_noise), always the
stochastic sde-dpmsolver++ first/second-order updates, v-prediction default.
Everything else (sigma ladders, multistep carry, lower-order demotion) is the
EDM DPM-Solver++ machinery — reused by subclassing.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..configuration_utils import register_to_config
from .scheduling_edm_dpmsolver_multistep import (
    EDMDPMSolverMultistepScheduler,
    EDMDPMSolverMultistepSchedulerOutput,
    EDMDPMSolverMultistepSchedulerState,
)

CosineDPMSolverMultistepSchedulerState = EDMDPMSolverMultistepSchedulerState
CosineDPMSolverMultistepSchedulerOutput = EDMDPMSolverMultistepSchedulerOutput


class CosineDPMSolverMultistepScheduler(EDMDPMSolverMultistepScheduler):
    order = 1

    @register_to_config
    def __init__(
        self,
        sigma_min: float = 0.3,
        sigma_max: float = 500,
        sigma_data: float = 1.0,
        sigma_schedule: str = "exponential",
        num_train_timesteps: int = 1000,
        solver_order: int = 2,
        prediction_type: str = "v_prediction",
        rho: float = 7.0,
        solver_type: str = "midpoint",
        lower_order_final: bool = True,
        euler_at_final: bool = False,
        final_sigmas_type: str = "zero",
    ):
        if solver_type not in ("midpoint", "heun"):
            if solver_type in ("logrho", "bh1", "bh2"):
                self.register_to_config(solver_type="midpoint")
            else:
                raise NotImplementedError(f"{solver_type} is not implemented")
        if solver_order > 2:
            raise NotImplementedError("solver_order > 2 not implemented")
        # the cosine variant is always the stochastic solver (reference updates
        # unconditionally consume `noise`, `:448,:489`)
        self.register_to_config(algorithm_type="sde-dpmsolver++", thresholding=False)
        self.init_noise_sigma = (sigma_max**2 + 1) ** 0.5

    def set_timesteps(self, num_inference_steps: int, sample_shape: Optional[tuple] = None):
        ramp = np.linspace(0, 1, num_inference_steps, dtype=np.float64)
        sigmas = self._compute_sigmas(ramp)
        timesteps = np.arctan(sigmas) / math.pi * 2  # precondition_noise (`:182`)
        sigma_last = self.config.sigma_min if self.config.final_sigmas_type == "sigma_min" else 0.0
        sigmas = np.concatenate([sigmas, [sigma_last]]).astype(np.float32)

        model_outputs = None
        if sample_shape is not None:
            model_outputs = jnp.zeros((self.config.solver_order, *sample_shape), dtype=jnp.float32)

        return CosineDPMSolverMultistepSchedulerState(
            timesteps=jnp.asarray(timesteps, dtype=jnp.float32),
            sigmas=jnp.asarray(sigmas),
            step_index=jnp.asarray(0, dtype=jnp.int32),
            model_outputs=model_outputs,
            lower_order_nums=jnp.asarray(0, dtype=jnp.int32),
            init_noise_sigma=self.init_noise_sigma,
            num_inference_steps=num_inference_steps,
        )
