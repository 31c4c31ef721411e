"""EDM-formulation DPM-Solver++ multistep — functional TPU-native.

Numerics follow the reference `scheduling_edm_dpmsolver_multistep.py`: Karras
rho-schedule sigmas between (sigma_min, sigma_max), EDM preconditioning
(c_in / c_skip / c_out, c_noise = 0.25·log σ), and the DPM-Solver++ orders 1–2
multistep updates with lower-order warmup/final demotion.
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
from .scheduling_utils import SchedulerMixin


@flax.struct.dataclass
class EDMDPMSolverMultistepSchedulerState:
    timesteps: jax.Array  # [S] c_noise values
    sigmas: jax.Array  # [S+1]
    step_index: jax.Array
    model_outputs: Optional[jax.Array]  # [order, *shape]
    lower_order_nums: jax.Array
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=80.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class EDMDPMSolverMultistepSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[EDMDPMSolverMultistepSchedulerState] = None


class EDMDPMSolverMultistepScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(
        self,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        sigma_data: float = 0.5,
        sigma_schedule: str = "karras",
        num_train_timesteps: int = 1000,
        prediction_type: str = "epsilon",
        rho: float = 7.0,
        solver_order: int = 2,
        thresholding: bool = False,
        dynamic_thresholding_ratio: float = 0.995,
        sample_max_value: float = 1.0,
        algorithm_type: str = "dpmsolver++",
        solver_type: str = "midpoint",
        lower_order_final: bool = True,
        euler_at_final: bool = False,
        final_sigmas_type: str = "zero",
    ):
        if algorithm_type not in ("dpmsolver++", "sde-dpmsolver++"):
            raise NotImplementedError(f"{algorithm_type} is not implemented")
        if solver_order > 2:
            raise NotImplementedError("solver_order > 2 not implemented")
        self.init_noise_sigma = (sigma_max**2 + 1) ** 0.5

    def _compute_sigmas(self, ramp: np.ndarray) -> np.ndarray:
        smin, smax, rho = self.config.sigma_min, self.config.sigma_max, self.config.rho
        if self.config.sigma_schedule == "karras":
            min_inv_rho = smin ** (1 / rho)
            max_inv_rho = smax ** (1 / rho)
            return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
        if self.config.sigma_schedule == "exponential":
            return np.exp(np.linspace(np.log(smax), np.log(smin), len(ramp)))
        raise ValueError(f"unsupported sigma_schedule {self.config.sigma_schedule}")

    def set_timesteps(self, num_inference_steps: int, sample_shape: Optional[tuple] = None):
        ramp = np.linspace(0, 1, num_inference_steps, dtype=np.float64)
        sigmas = self._compute_sigmas(ramp)
        timesteps = 0.25 * np.log(sigmas)
        sigma_last = self.config.sigma_min if self.config.final_sigmas_type == "sigma_min" else 0.0
        sigmas = np.concatenate([sigmas, [sigma_last]]).astype(np.float32)

        model_outputs = None
        if sample_shape is not None:
            model_outputs = jnp.zeros((self.config.solver_order, *sample_shape), dtype=jnp.float32)

        return EDMDPMSolverMultistepSchedulerState(
            timesteps=jnp.asarray(timesteps, dtype=jnp.float32),
            sigmas=jnp.asarray(sigmas),
            step_index=jnp.asarray(0, dtype=jnp.int32),
            model_outputs=model_outputs,
            lower_order_nums=jnp.asarray(0, dtype=jnp.int32),
            init_noise_sigma=self.init_noise_sigma,
            num_inference_steps=num_inference_steps,
        )

    def prepare(self, state, sample):
        if state.model_outputs is not None:
            return state
        return state.replace(
            model_outputs=jnp.zeros((self.config.solver_order, *sample.shape), dtype=jnp.float32)
        )

    # -- EDM preconditioning -----------------------------------------------
    def precondition_inputs(self, sample, sigma):
        return sample * (1.0 / (sigma**2 + self.config.sigma_data**2) ** 0.5)

    def precondition_outputs(self, sample, model_output, sigma):
        sd = self.config.sigma_data
        c_skip = sd**2 / (sigma**2 + sd**2)
        if self.config.prediction_type == "epsilon":
            c_out = sigma * sd / (sigma**2 + sd**2) ** 0.5
        elif self.config.prediction_type == "v_prediction":
            c_out = -sigma * sd / (sigma**2 + sd**2) ** 0.5
        else:
            raise ValueError(f"unsupported prediction_type {self.config.prediction_type}")
        return c_skip * sample + c_out * model_output

    def scale_model_input(self, state, sample, timestep=None):
        return self.precondition_inputs(sample, state.sigmas[state.step_index])

    def _sigma_to_alpha_sigma_t(self, sigma):
        return 1.0, sigma  # EDM parameterization: alpha_t == 1

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
        S = state.timesteps.shape[0]

        sample_f = sample.astype(jnp.float32)
        x0 = self.precondition_outputs(sample_f, model_output.astype(jnp.float32), state.sigmas[idx])
        model_outputs = jnp.concatenate([state.model_outputs[1:], x0[None]], axis=0)

        lower_order_final = (idx == S - 1) & (
            self.config.euler_at_final
            or (self.config.lower_order_final and S < 15)
            or self.config.final_sigmas_type == "zero"
        )
        use_first = (state.lower_order_nums < 1) | lower_order_final

        def lam(s):
            return -jnp.log(jnp.maximum(s, 1e-20))

        sigma_t, sigma_s0 = state.sigmas[idx + 1], state.sigmas[idx]
        sigma_s1 = state.sigmas[jnp.maximum(idx - 1, 0)]
        h = lam(sigma_t) - lam(sigma_s0)
        m0, m1 = model_outputs[-1], model_outputs[-2]

        noise = None
        if self.config.algorithm_type == "sde-dpmsolver++":
            if variance_noise is None:
                if key is None:
                    raise ValueError("sde-dpmsolver++ requires a PRNG key or variance_noise")
                variance_noise = randn_tensor(model_output.shape, key=key, dtype=jnp.float32)
            noise = variance_noise.astype(jnp.float32)

        if self.config.algorithm_type == "dpmsolver++":
            x_first = (sigma_t / sigma_s0) * sample_f - (jnp.exp(-h) - 1.0) * m0
        else:
            x_first = (
                (sigma_t / sigma_s0 * jnp.exp(-h)) * sample_f
                + (1 - jnp.exp(-2.0 * h)) * m0
                + sigma_t * jnp.sqrt(1.0 - jnp.exp(-2 * h)) * noise
            )

        h_0 = lam(sigma_s0) - lam(sigma_s1)
        r0 = h_0 / h
        D0 = m0
        D1 = (m0 - m1) / jnp.where(r0 == 0, 1.0, r0)
        if self.config.algorithm_type == "dpmsolver++":
            if self.config.solver_type == "midpoint":
                x_second = (sigma_t / sigma_s0) * sample_f - (jnp.exp(-h) - 1.0) * D0 - 0.5 * (jnp.exp(-h) - 1.0) * D1
            else:
                x_second = (
                    (sigma_t / sigma_s0) * sample_f
                    - (jnp.exp(-h) - 1.0) * D0
                    + ((jnp.exp(-h) - 1.0) / h + 1.0) * D1
                )
        else:
            if self.config.solver_type == "midpoint":
                x_second = (
                    (sigma_t / sigma_s0 * jnp.exp(-h)) * sample_f
                    + (1 - jnp.exp(-2.0 * h)) * D0
                    + 0.5 * (1 - jnp.exp(-2.0 * h)) * D1
                    + sigma_t * jnp.sqrt(1.0 - jnp.exp(-2 * h)) * noise
                )
            else:
                x_second = (
                    (sigma_t / sigma_s0 * jnp.exp(-h)) * sample_f
                    + (1 - jnp.exp(-2.0 * h)) * D0
                    + ((1.0 - jnp.exp(-2.0 * h)) / (-2.0 * h) + 1.0) * D1
                    + sigma_t * jnp.sqrt(1.0 - jnp.exp(-2 * h)) * noise
                )

        prev_sample = jnp.where(use_first, x_first, x_second).astype(model_output.dtype)
        new_state = state.replace(
            step_index=idx + 1,
            model_outputs=model_outputs,
            lower_order_nums=jnp.minimum(state.lower_order_nums + 1, self.config.solver_order),
        )
        if not return_dict:
            return (prev_sample, new_state)
        return EDMDPMSolverMultistepSchedulerOutput(prev_sample=prev_sample, state=new_state)

    def add_noise(self, state, original_samples, noise, timesteps):
        from .scheduling_utils import broadcast_to_left, index_for_timestep

        schedule = state.timesteps
        ts = jnp.atleast_1d(jnp.asarray(timesteps, dtype=schedule.dtype))
        indices = jax.vmap(lambda t: index_for_timestep(schedule, t))(ts)
        sigma = broadcast_to_left(state.sigmas[indices].astype(original_samples.dtype), original_samples.ndim)
        return original_samples + noise * sigma

    def __len__(self):
        return self.config.num_train_timesteps
