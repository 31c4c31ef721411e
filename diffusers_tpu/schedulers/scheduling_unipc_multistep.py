"""UniPC multistep sampler — functional TPU-native implementation.

Numerics follow the reference `scheduling_unipc_multistep.py`
(`/root/reference/src/diffusers/schedulers/scheduling_unipc_multistep.py`:
predictor `multistep_uni_p_bh_update`, corrector `multistep_uni_c_bh_update`,
step). Supports the shipped configs: predict_x0=True, solver_type bh1/bh2,
solver_order ≤ 2 (every released SD/SDXL/Wan config), epsilon / v_prediction /
flow_prediction, karras/flow sigma ladders.

Functional multistep design: converted-output history, last_sample and
step_index live in the state; the order-2 corrector's 2×2 linear solve is
closed-form, so the step is pure gathers + FMAs and the warm-up order
selection is a `jnp.where`.
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
    make_spaced_timesteps,
    rescale_zero_terminal_snr,
)
from .sigma_utils import convert_to_karras, sigma_to_t


@flax.struct.dataclass
class UniPCMultistepSchedulerState:
    timesteps: jax.Array
    sigmas: jax.Array  # [S+1]
    alphas_cumprod: jax.Array
    step_index: jax.Array
    model_outputs: Optional[jax.Array]  # [2, *shape] converted (x0) outputs
    last_sample: Optional[jax.Array]
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class UniPCMultistepSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[UniPCMultistepSchedulerState] = None


class UniPCMultistepScheduler(SchedulerMixin, ConfigMixin):
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
        predict_x0: bool = True,
        solver_type: str = "bh2",
        lower_order_final: bool = True,
        disable_corrector: List[int] = [],
        use_karras_sigmas: bool = False,
        use_flow_sigmas: bool = False,
        flow_shift: float = 1.0,
        timestep_spacing: str = "linspace",
        steps_offset: int = 0,
        final_sigmas_type: str = "zero",
        rescale_betas_zero_snr: bool = False,
    ):
        if not predict_x0:
            raise NotImplementedError("predict_x0=False UniPC variant not implemented (unused by shipped configs)")
        if solver_order > 3:
            raise NotImplementedError("solver_order must be 1, 2 or 3")
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end, trained_betas)
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0)
        if rescale_betas_zero_snr:
            self.alphas_cumprod[-1] = 2**-24
        self.init_noise_sigma = 1.0

    def set_timesteps(self, num_inference_steps: int, mu: Optional[float] = None,
                      sample_shape: Optional[tuple] = None) -> UniPCMultistepSchedulerState:
        flow_shift = float(np.exp(mu)) if mu is not None else self.config.flow_shift
        sigmas_full = np.array(((1 - self.alphas_cumprod) / self.alphas_cumprod) ** 0.5)
        log_sigmas = np.log(sigmas_full)

        # DPM-family spacing: N+1 grid points, drop the last (reference
        # scheduling_unipc_multistep.py set_timesteps, copied from DPMSolver)
        T = self.config.num_train_timesteps
        if self.config.timestep_spacing == "linspace":
            base_ts = np.linspace(0, T - 1, num_inference_steps + 1).round()[::-1][:-1].copy().astype(np.int64)
        elif self.config.timestep_spacing == "leading":
            step_ratio = T // (num_inference_steps + 1)
            base_ts = (np.arange(0, num_inference_steps + 1) * step_ratio).round()[::-1][:-1].copy().astype(np.int64)
            base_ts += self.config.steps_offset
        elif self.config.timestep_spacing == "trailing":
            step_ratio = T / num_inference_steps
            base_ts = np.arange(T, 0, -step_ratio).round().copy().astype(np.int64)
            base_ts -= 1
        else:
            raise ValueError(f"unsupported timestep_spacing {self.config.timestep_spacing}")

        if self.config.use_flow_sigmas:
            alphas = np.linspace(1, 1 / T, num_inference_steps + 1)
            sigmas = 1.0 - alphas
            sigmas = np.flip(flow_shift * sigmas / (1 + (flow_shift - 1) * sigmas))[:-1].copy()
            ts = (sigmas * T).copy().astype(np.float32)
        elif self.config.use_karras_sigmas:
            sigmas = np.flip(sigmas_full).copy()
            sigmas = convert_to_karras(sigmas, num_inference_steps)
            ts = np.array([sigma_to_t(s, log_sigmas) for s in sigmas]).round().astype(np.int64)
        else:
            ts = base_ts
            sigmas = np.interp(ts, np.arange(0, len(sigmas_full)), sigmas_full)

        if self.config.final_sigmas_type == "sigma_min":
            sigma_last = float(sigmas_full[0])
        else:
            sigma_last = 0.0
        sigmas = np.concatenate([sigmas, [sigma_last]]).astype(np.float32)

        model_outputs = None
        last_sample = None
        if sample_shape is not None:
            model_outputs = jnp.zeros((max(self.config.solver_order, 2), *sample_shape), dtype=jnp.float32)
            last_sample = jnp.zeros(sample_shape, dtype=jnp.float32)

        return UniPCMultistepSchedulerState(
            timesteps=jnp.asarray(ts, dtype=jnp.float32 if self.config.use_flow_sigmas else jnp.int32),
            sigmas=jnp.asarray(sigmas, dtype=jnp.float32),
            alphas_cumprod=jnp.asarray(self.alphas_cumprod, dtype=jnp.float32),
            step_index=jnp.asarray(0, dtype=jnp.int32),
            model_outputs=model_outputs,
            last_sample=last_sample,
            num_inference_steps=num_inference_steps,
        )

    def prepare(self, state, sample):
        if state.model_outputs is not None:
            return state
        return state.replace(
            model_outputs=jnp.zeros((max(self.config.solver_order, 2), *sample.shape), dtype=jnp.float32),
            last_sample=jnp.zeros(sample.shape, dtype=jnp.float32),
        )

    def scale_model_input(self, state, sample, timestep=None):
        return sample

    def _sigma_to_alpha_sigma_t(self, sigma):
        if self.config.use_flow_sigmas:
            return 1 - sigma, sigma
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
        """→ x0 prediction (predict_x0=True path)."""
        sigma = state.sigmas[idx]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma)
        if self.config.prediction_type == "epsilon":
            x0 = (sample - sigma_t * model_output) / alpha_t
        elif self.config.prediction_type == "sample":
            x0 = model_output
        elif self.config.prediction_type == "v_prediction":
            x0 = alpha_t * sample - sigma_t * model_output
        elif self.config.prediction_type == "flow_prediction":
            x0 = sample - state.sigmas[idx] * model_output
        else:
            raise ValueError(f"unsupported prediction_type {self.config.prediction_type}")
        if self.config.thresholding:
            x0 = self._threshold_sample(x0)
        return x0

    def _lambdas(self, state, idx):
        sigma = state.sigmas[idx]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma)
        return jnp.log(alpha_t) - jnp.log(jnp.maximum(sigma_t, 1e-20)), alpha_t, sigma_t

    def _bh_coeffs(self, hh):
        """(b0, b1, B_h) of the bh solver family for order<=2."""
        h_phi_1 = jnp.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1
        B_h = hh if self.config.solver_type == "bh1" else jnp.expm1(hh)
        b0 = h_phi_k * 1.0 / B_h  # i=1: factorial 1
        h_phi_k2 = h_phi_k / hh - 1 / 2
        b1 = h_phi_k2 * 2.0 / B_h  # i=2: factorial 2
        return b0, b1, B_h, h_phi_1

    def _bh_b2(self, hh, B_h):
        """Third b-vector entry (i=3): h_phi_3 * 3! / B_h (reference uni_p loop)."""
        h_phi_1 = jnp.expm1(hh)
        h_phi_k1 = h_phi_1 / hh - 1
        h_phi_k2 = h_phi_k1 / hh - 1 / 2
        h_phi_k3 = h_phi_k2 / hh - 1 / 6
        return h_phi_k3 * 6.0 / B_h

    def _predictor(self, state, sample, idx, this_order):
        """uni_p update (predict_x0); order 1/2/3 selected by traced `this_order`."""
        m0 = state.model_outputs[-1]
        lambda_t, alpha_t, sigma_t = self._lambdas(state, idx + 1)
        lambda_s0, alpha_s0, sigma_s0 = self._lambdas(state, idx)
        h = lambda_t - lambda_s0
        hh = -h
        b0, b1, B_h, h_phi_1 = self._bh_coeffs(hh)

        x_t_ = sigma_t / sigma_s0 * sample - alpha_t * h_phi_1 * m0
        # order 2 residual
        m1 = state.model_outputs[-2]
        lambda_s1, _, _ = self._lambdas(state, jnp.maximum(idx - 1, 0))
        rk = (lambda_s1 - lambda_s0) / h
        D1 = (m1 - m0) / jnp.where(rk == 0, 1.0, rk)
        pred_res2 = 0.5 * D1  # rhos_p = [0.5] for order 2
        x_t2 = x_t_ - alpha_t * B_h * pred_res2
        out = jnp.where(this_order >= 2, x_t2, x_t_)

        if self.config.solver_order >= 3:
            # order 3: rks = [r0, r1, 1]; rhos_p = solve(R[:2,:2], b[:2]) with
            # R = [[1, 1], [r0, r1]] (reference multistep_uni_p_bh_update)
            m2 = state.model_outputs[-3]
            lambda_s2, _, _ = self._lambdas(state, jnp.maximum(idx - 2, 0))
            r0 = rk
            r1 = (lambda_s2 - lambda_s0) / h
            r0 = jnp.where(r0 == 0, 1e-6, r0)
            r1 = jnp.where(jnp.abs(r1 - r0) < 1e-12, r0 + 1e-6, r1)
            r1 = jnp.where(r1 == 0, 1e-6, r1)
            D1s0 = (m1 - m0) / r0
            D1s1 = (m2 - m0) / r1
            p1 = (b1 - r0 * b0) / (r1 - r0)
            p0 = b0 - p1
            x_t3 = x_t_ - alpha_t * B_h * (p0 * D1s0 + p1 * D1s1)
            out = jnp.where(this_order >= 3, x_t3, out)
        return out

    def _corrector(self, state, this_model_output, this_sample, idx, this_order):
        """uni_c update at step idx (>0): corrects this_sample using the new output."""
        m0 = state.model_outputs[-1]
        x = state.last_sample
        lambda_t, alpha_t, sigma_t = self._lambdas(state, idx)
        lambda_s0, alpha_s0, sigma_s0 = self._lambdas(state, jnp.maximum(idx - 1, 0))
        h = lambda_t - lambda_s0
        hh = -h
        b0, b1, B_h, h_phi_1 = self._bh_coeffs(hh)

        x_t_ = sigma_t / sigma_s0 * x - alpha_t * h_phi_1 * m0
        D1_t = this_model_output - m0

        # order 1: rhos_c = [0.5]
        x_t1 = x_t_ - alpha_t * B_h * (0.5 * D1_t)

        # order 2: solve [[1,1],[r0,1]] rhos = [b0,b1]
        m1 = state.model_outputs[-2]
        lambda_s1, _, _ = self._lambdas(state, jnp.maximum(idx - 2, 0))
        r0 = (lambda_s1 - lambda_s0) / h
        D1s0 = (m1 - m0) / jnp.where(r0 == 0, 1.0, r0)
        denom = jnp.where(jnp.abs(1.0 - r0) < 1e-12, 1.0, 1.0 - r0)
        rc0 = (b0 - b1) / denom
        rc1 = b0 - rc0
        x_t2 = x_t_ - alpha_t * B_h * (rc0 * D1s0 + rc1 * D1_t)
        out = jnp.where(this_order >= 2, x_t2, x_t1)

        if self.config.solver_order >= 3:
            # order 3: rks = [r0, r1, 1]; rhos_c = solve(R, b) with
            # R = [[1,1,1],[r0,r1,1],[r0²,r1²,1]], b = [b0,b1,b2]
            # (reference multistep_uni_c_bh_update)
            m2 = state.model_outputs[-3]
            lambda_s2, _, _ = self._lambdas(state, jnp.maximum(idx - 3, 0))
            r1 = (lambda_s2 - lambda_s0) / h
            r0g = jnp.where(r0 == 0, 1e-6, r0)
            r1g = jnp.where(jnp.abs(r1 - r0g) < 1e-12, r0g + 1e-6, r1)
            r1g = jnp.where(r1g == 0, 1e-6, r1g)
            D1s1 = (m2 - m0) / r1g
            b2 = self._bh_b2(hh, B_h)
            R = jnp.stack(
                [
                    jnp.stack([jnp.ones_like(r0g), jnp.ones_like(r0g), jnp.ones_like(r0g)]),
                    jnp.stack([r0g, r1g, jnp.ones_like(r0g)]),
                    jnp.stack([r0g**2, r1g**2, jnp.ones_like(r0g)]),
                ]
            )
            bvec = jnp.stack([b0, b1, b2])
            rhos = jnp.linalg.solve(R, bvec)
            D1s0_3 = (m1 - m0) / r0g
            x_t3 = x_t_ - alpha_t * B_h * (rhos[0] * D1s0_3 + rhos[1] * D1s1 + rhos[2] * D1_t)
            out = jnp.where(this_order >= 3, x_t3, out)
        return out

    def step(self, state, model_output, timestep, sample, return_dict: bool = True):
        if state.num_inference_steps is None:
            raise ValueError("run set_timesteps before step")
        state = self.prepare(state, sample)
        idx = state.step_index
        S = state.timesteps.shape[0]

        sample_f = sample.astype(jnp.float32)
        converted = self.convert_model_output(state, model_output.astype(jnp.float32), sample_f, idx)

        # corrector (uses PREVIOUS history and last_sample; its order is the
        # this_order computed at the previous step — reference stores it as
        # self.this_order across iterations)
        if self.config.lower_order_final:
            corr_order = jnp.minimum(self.config.solver_order, S - (idx - 1))
        else:
            corr_order = jnp.asarray(self.config.solver_order)
        corr_order = jnp.minimum(corr_order, jnp.minimum(idx - 1, self.config.solver_order) + 1)
        use_corrector = idx > 0
        if self.config.disable_corrector:
            disable = jnp.asarray(self.config.disable_corrector)
            use_corrector = use_corrector & jnp.all(idx - 1 != disable)
        corrected = self._corrector(state, converted, sample_f, idx, corr_order)
        sample_f = jnp.where(use_corrector, corrected, sample_f)

        # rotate history
        model_outputs = jnp.concatenate([state.model_outputs[1:], converted[None]], axis=0)
        state = state.replace(model_outputs=model_outputs)

        # predictor order selection (reference: this_order = min(order, S - idx, lower_order_nums+1))
        if self.config.lower_order_final:
            this_order = jnp.minimum(self.config.solver_order, S - idx)
        else:
            this_order = jnp.asarray(self.config.solver_order)
        this_order = jnp.minimum(this_order, jnp.minimum(idx, self.config.solver_order) + 1)

        prev_sample = self._predictor(state, sample_f, idx, this_order)
        prev_sample = prev_sample.astype(model_output.dtype)

        new_state = state.replace(step_index=idx + 1, last_sample=sample_f)
        if not return_dict:
            return (prev_sample, new_state)
        return UniPCMultistepSchedulerOutput(prev_sample=prev_sample, state=new_state)

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
