"""DDPM (ancestral) sampler — functional TPU-native implementation.

Numerics mirror the reference `scheduling_ddpm.py` (DDPMScheduler:
`/root/reference/src/diffusers/schedulers/scheduling_ddpm.py:137`; step math
`:463-559`, formulas (6)/(7)/(15) of https://huggingface.co/papers/2006.11239),
re-expressed as a pure function over an immutable state so an entire sampling
run is one `lax.scan`.

TPU design note: every per-timestep scalar (x0/xt posterior coefficients,
ancestral sigma, 1/sqrt(alpha_bar)) is precomputed in float64 numpy at
``set_timesteps`` time and stored as a float32 table indexed by schedule
position. The traced ``step`` is then just gathers + FMAs — no divisions, so
XLA's reciprocal-multiply fp32 division (which drifts ~1e-4 over 1000 steps)
never enters the loop, and we match the reference's CPU-fp32 goldens.
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
from ..utils.jax_utils import randn_tensor
from .scheduling_utils import (
    KarrasDiffusionSchedulers,
    SchedulerMixin,
    broadcast_to_left,
    index_for_timestep,
    make_beta_schedule,
    make_spaced_timesteps,
    rescale_zero_terminal_snr,
)


@flax.struct.dataclass
class DDPMSchedulerState:
    """Immutable sampling state; all per-step scalars are precomputed tables
    indexed by schedule position."""

    timesteps: jax.Array  # int32 [S], descending
    alphas_cumprod: jax.Array  # float32 [T] (training ladder, for add_noise)
    # per-schedule-position coefficient tables, float32 [S]:
    sqrt_alpha_prod: jax.Array  # sqrt(ᾱ_t)
    sqrt_beta_prod: jax.Array  # sqrt(1-ᾱ_t)
    inv_sqrt_alpha_prod: jax.Array  # 1/sqrt(ᾱ_t)
    x0_coeff: jax.Array  # sqrt(ᾱ_prev)·β_t / (1-ᾱ_t)
    xt_coeff: jax.Array  # sqrt(α_t)·(1-ᾱ_prev) / (1-ᾱ_t)
    sigma: jax.Array  # ancestral std-dev (0 at t==0) for fixed variance types
    min_log_var: jax.Array  # log clipped posterior variance (learned_range)
    max_log_var: jax.Array  # log β_t (learned_range)
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class DDPMSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[DDPMSchedulerState] = None


class DDPMScheduler(SchedulerMixin, ConfigMixin):
    """Denoising diffusion probabilistic models sampler (Ho et al. 2020)."""

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
        variance_type: str = "fixed_small",
        clip_sample: bool = True,
        prediction_type: str = "epsilon",
        thresholding: bool = False,
        dynamic_thresholding_ratio: float = 0.995,
        clip_sample_range: float = 1.0,
        sample_max_value: float = 1.0,
        timestep_spacing: str = "leading",
        steps_offset: int = 0,
        rescale_betas_zero_snr: bool = False,
    ):
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end, trained_betas)
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0)
        self.init_noise_sigma = 1.0

    # ------------------------------------------------------------------ API
    def set_timesteps(
        self,
        num_inference_steps: Optional[int] = None,
        timesteps: Optional[List[int]] = None,
    ) -> DDPMSchedulerState:
        """Build the inference-time state (pure; returns a fresh state pytree).
        With no arguments, uses the full training schedule."""
        if num_inference_steps is not None and timesteps is not None:
            raise ValueError("Can only pass one of `num_inference_steps` or `timesteps`.")
        if timesteps is not None:
            for i in range(1, len(timesteps)):
                if timesteps[i] >= timesteps[i - 1]:
                    raise ValueError("`timesteps` must be in descending order.")
            if timesteps[0] >= self.config.num_train_timesteps:
                raise ValueError("`timesteps` must start before num_train_timesteps.")
            ts = np.array(timesteps, dtype=np.int64)
            num_inference_steps = len(ts)
        elif num_inference_steps is not None:
            if num_inference_steps > self.config.num_train_timesteps:
                raise ValueError(
                    f"num_inference_steps ({num_inference_steps}) > num_train_timesteps "
                    f"({self.config.num_train_timesteps})"
                )
            ts = make_spaced_timesteps(
                num_inference_steps,
                self.config.num_train_timesteps,
                self.config.timestep_spacing,
                self.config.steps_offset,
            )
        else:
            ts = np.arange(0, self.config.num_train_timesteps)[::-1].copy()
            num_inference_steps = None

        # ---- float64 coefficient tables (schedule position -> scalar) ----
        acp = self.alphas_cumprod.astype(np.float64)
        apt = acp[ts]
        prev_ts = np.concatenate([ts[1:], [-1]])
        aptp = np.where(prev_ts >= 0, acp[np.clip(prev_ts, 0, None)], 1.0)
        bpt = 1.0 - apt
        bptp = 1.0 - aptp
        current_alpha = apt / aptp
        current_beta = 1.0 - current_alpha

        posterior_var = np.clip(bptp / bpt * current_beta, 1e-20, None)
        vt = self.config.variance_type
        if vt == "fixed_small":
            sigma = np.sqrt(posterior_var)
        elif vt == "fixed_small_log":
            sigma = np.exp(0.5 * np.log(posterior_var))
        elif vt == "fixed_large":
            sigma = np.sqrt(np.clip(current_beta, 0, None))
        elif vt == "fixed_large_log":
            # Glide max_log convention: sigma stored as exp(0.5·log β_t)
            sigma = np.exp(0.5 * np.log(np.clip(current_beta, 1e-20, None)))
        else:  # learned / learned_range resolve at runtime from the tables
            sigma = np.sqrt(posterior_var)
        sigma = np.where(ts > 0, sigma, 0.0)

        def f32(x):
            return jnp.asarray(x.astype(np.float32))

        return DDPMSchedulerState(
            timesteps=jnp.asarray(ts, dtype=jnp.int32),
            alphas_cumprod=jnp.asarray(self.alphas_cumprod, dtype=jnp.float32),
            sqrt_alpha_prod=f32(np.sqrt(apt)),
            sqrt_beta_prod=f32(np.sqrt(bpt)),
            inv_sqrt_alpha_prod=f32(1.0 / np.sqrt(apt)),
            x0_coeff=f32(np.sqrt(aptp) * current_beta / bpt),
            xt_coeff=f32(np.sqrt(current_alpha) * bptp / bpt),
            sigma=f32(sigma),
            min_log_var=f32(np.log(posterior_var)),
            max_log_var=f32(np.log(np.clip(current_beta, 1e-20, None))),
            init_noise_sigma=1.0,
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state: DDPMSchedulerState, sample: jax.Array, timestep=None) -> jax.Array:
        return sample

    def _get_variance(self, alpha_prod_t, alpha_prod_t_prev, predicted_variance=None, variance_type=None):
        """Posterior variance from raw ladder values (kept for API parity and
        training utilities; the sampling path uses the precomputed tables)."""
        current_beta_t = 1 - alpha_prod_t / alpha_prod_t_prev
        variance = (1 - alpha_prod_t_prev) / (1 - alpha_prod_t) * current_beta_t
        variance = jnp.clip(variance, min=1e-20)

        if variance_type is None:
            variance_type = self.config.variance_type
        if variance_type == "fixed_small":
            return variance
        if variance_type == "fixed_small_log":
            return jnp.exp(0.5 * jnp.log(variance))
        if variance_type == "fixed_large":
            return current_beta_t
        if variance_type == "fixed_large_log":
            return jnp.log(current_beta_t)
        if variance_type == "learned":
            return predicted_variance
        if variance_type == "learned_range":
            min_log = jnp.log(variance)
            max_log = jnp.log(current_beta_t)
            frac = (predicted_variance + 1) / 2
            return frac * max_log + (1 - frac) * min_log
        raise ValueError(f"unknown variance_type {variance_type}")

    def _threshold_sample(self, sample: jax.Array) -> jax.Array:
        """Dynamic thresholding (https://huggingface.co/papers/2205.11487)."""
        dtype = sample.dtype
        batch_size = sample.shape[0]
        flat = sample.astype(jnp.float32).reshape(batch_size, -1)
        abs_sample = jnp.abs(flat)
        s = jnp.quantile(abs_sample, self.config.dynamic_thresholding_ratio, axis=1)
        s = jnp.clip(s, 1, self.config.sample_max_value)[:, None]
        flat = jnp.clip(flat, -s, s) / s
        return flat.reshape(sample.shape).astype(dtype)

    def step(
        self,
        state: DDPMSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        key: Optional[jax.Array] = None,
        variance_noise: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        """One reverse-diffusion step. `timestep` may be a python int or a
        traced scalar (e.g. scanned from `state.timesteps`)."""
        t = jnp.asarray(timestep, dtype=jnp.int32)
        idx = index_for_timestep(state.timesteps, t)

        if model_output.shape[1] == sample.shape[1] * 2 and self.config.variance_type in ("learned", "learned_range"):
            model_output, predicted_variance = jnp.split(model_output, 2, axis=1)
        else:
            predicted_variance = None

        compute_dtype = jnp.promote_types(sample.dtype, jnp.float32)
        sample_f = sample.astype(compute_dtype)
        model_output_f = model_output.astype(compute_dtype)

        # predicted x_0 (formula (15)) — multiplies by precomputed 1/sqrt(ᾱ)
        if self.config.prediction_type == "epsilon":
            pred_original_sample = (
                sample_f - state.sqrt_beta_prod[idx] * model_output_f
            ) * state.inv_sqrt_alpha_prod[idx]
        elif self.config.prediction_type == "sample":
            pred_original_sample = model_output_f
        elif self.config.prediction_type == "v_prediction":
            pred_original_sample = (
                state.sqrt_alpha_prod[idx] * sample_f - state.sqrt_beta_prod[idx] * model_output_f
            )
        else:
            raise ValueError(
                f"prediction_type {self.config.prediction_type} must be `epsilon`, `sample` or `v_prediction`"
            )

        # clip/threshold x_0
        if self.config.thresholding:
            pred_original_sample = self._threshold_sample(pred_original_sample)
        elif self.config.clip_sample:
            pred_original_sample = jnp.clip(
                pred_original_sample, -self.config.clip_sample_range, self.config.clip_sample_range
            )

        # posterior mean µ_t (formula (7))
        pred_prev_sample = state.x0_coeff[idx] * pred_original_sample + state.xt_coeff[idx] * sample_f

        # ancestral noise (sigma table is 0 at t == 0, so no branch needed)
        if variance_noise is None and key is not None:
            variance_noise = randn_tensor(model_output.shape, key=key, dtype=compute_dtype)
        if variance_noise is not None:
            if self.config.variance_type == "learned":
                sigma = jnp.where(t > 0, predicted_variance**0.5, 0.0)
            elif self.config.variance_type == "learned_range":
                frac = (predicted_variance + 1) / 2
                log_var = frac * state.max_log_var[idx] + (1 - frac) * state.min_log_var[idx]
                sigma = jnp.where(t > 0, jnp.exp(0.5 * log_var), 0.0)
            else:
                sigma = state.sigma[idx]
            pred_prev_sample = pred_prev_sample + sigma * variance_noise.astype(compute_dtype)

        pred_prev_sample = pred_prev_sample.astype(sample.dtype)
        pred_original_sample = pred_original_sample.astype(sample.dtype)
        if not return_dict:
            return (pred_prev_sample, pred_original_sample)
        return DDPMSchedulerOutput(
            prev_sample=pred_prev_sample, pred_original_sample=pred_original_sample, state=state
        )

    def add_noise(self, state: DDPMSchedulerState, original_samples, noise, timesteps):
        alphas_cumprod = state.alphas_cumprod.astype(original_samples.dtype)
        sqrt_alpha_prod = broadcast_to_left(alphas_cumprod[timesteps] ** 0.5, original_samples.ndim)
        sqrt_one_minus = broadcast_to_left((1 - alphas_cumprod[timesteps]) ** 0.5, original_samples.ndim)
        return sqrt_alpha_prod * original_samples + sqrt_one_minus * noise

    def get_velocity(self, state: DDPMSchedulerState, sample, noise, timesteps):
        alphas_cumprod = state.alphas_cumprod.astype(sample.dtype)
        sqrt_alpha_prod = broadcast_to_left(alphas_cumprod[timesteps] ** 0.5, sample.ndim)
        sqrt_one_minus = broadcast_to_left((1 - alphas_cumprod[timesteps]) ** 0.5, sample.ndim)
        return sqrt_alpha_prod * noise - sqrt_one_minus * sample

    def __len__(self):
        return self.config.num_train_timesteps
