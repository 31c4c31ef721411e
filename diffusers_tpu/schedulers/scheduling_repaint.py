"""RePaint inpainting sampler — functional TPU-native.

Numerics follow the reference `scheduling_repaint.py`: resampling ("jump")
schedule precomputed on the host, DDIM-style variance, per-step blend of the
known region (noised original) with the denoised unknown region through the
mask, and `undo_step` re-noising for the forward jumps. All randomness enters
through explicit PRNG keys / noise tensors so the whole resampling loop can
live in one `lax.scan` (jumps are just entries in the precomputed timestep
array — forward moves call `undo_step`).
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
from .scheduling_utils import SchedulerMixin, make_beta_schedule


@flax.struct.dataclass
class RePaintSchedulerState:
    timesteps: jax.Array  # [L] resampling schedule (with jumps)
    alphas_cumprod: jax.Array  # [T]
    betas: jax.Array  # [T]
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class RePaintSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[RePaintSchedulerState] = None


class RePaintScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        eta: float = 0.0,
        trained_betas: Optional[List[float]] = None,
        clip_sample: bool = True,
    ):
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end, trained_betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0)
        self.init_noise_sigma = 1.0

    def set_timesteps(
        self, num_inference_steps: int, jump_length: int = 10, jump_n_sample: int = 10
    ) -> RePaintSchedulerState:
        num_inference_steps = min(self.config.num_train_timesteps, num_inference_steps)

        timesteps = []
        jumps = {}
        for j in range(0, num_inference_steps - jump_length, jump_length):
            jumps[j] = jump_n_sample - 1
        t = num_inference_steps
        while t >= 1:
            t = t - 1
            timesteps.append(t)
            if jumps.get(t, 0) > 0:
                jumps[t] = jumps[t] - 1
                for _ in range(jump_length):
                    t = t + 1
                    timesteps.append(t)
        timesteps = np.array(timesteps) * (self.config.num_train_timesteps // num_inference_steps)

        return RePaintSchedulerState(
            timesteps=jnp.asarray(timesteps, dtype=jnp.int32),
            alphas_cumprod=jnp.asarray(self.alphas_cumprod, dtype=jnp.float32),
            betas=jnp.asarray(self.betas, dtype=jnp.float32),
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state, sample, timestep=None):
        return sample

    def _get_variance(self, state, t):
        prev_t = t - self.config.num_train_timesteps // state.num_inference_steps
        alpha_prod_t = state.alphas_cumprod[t]
        alpha_prod_t_prev = jnp.where(prev_t >= 0, state.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        return (beta_prod_t_prev / beta_prod_t) * (1 - alpha_prod_t / alpha_prod_t_prev)

    def step(
        self,
        state,
        model_output,
        timestep,
        sample,
        original_image,
        mask,
        key: Optional[jax.Array] = None,
        variance_noise: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        """mask convention matches the reference: 1 = known pixel (kept), 0 =
        region to inpaint."""
        t = jnp.asarray(timestep, dtype=jnp.int32)
        prev_t = t - self.config.num_train_timesteps // state.num_inference_steps

        sample_f = sample.astype(jnp.float32)
        mo = model_output.astype(jnp.float32)
        alpha_prod_t = state.alphas_cumprod[t]
        alpha_prod_t_prev = jnp.where(prev_t >= 0, state.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
        beta_prod_t = 1 - alpha_prod_t

        pred_original = (sample_f - beta_prod_t**0.5 * mo) / alpha_prod_t**0.5
        if self.config.clip_sample:
            pred_original = jnp.clip(pred_original, -1.0, 1.0)

        if variance_noise is None:
            if key is None:
                raise ValueError("RePaint requires a PRNG key or variance_noise")
            variance_noise = randn_tensor(model_output.shape, key=key, dtype=jnp.float32)
        noise = variance_noise.astype(jnp.float32)

        eta = self.config.eta
        std_dev_t = eta * self._get_variance(state, t) ** 0.5
        variance = jnp.where((t > 0) & (eta > 0), std_dev_t * noise, 0.0)

        pred_sample_direction = jnp.maximum(1 - alpha_prod_t_prev - std_dev_t**2, 0.0) ** 0.5 * mo
        prev_unknown = alpha_prod_t_prev**0.5 * pred_original + pred_sample_direction + variance
        prev_known = alpha_prod_t_prev**0.5 * original_image.astype(jnp.float32) + (1 - alpha_prod_t_prev) ** 0.5 * noise

        prev_sample = (mask * prev_known + (1.0 - mask) * prev_unknown).astype(model_output.dtype)
        if not return_dict:
            return (prev_sample, pred_original.astype(model_output.dtype))
        return RePaintSchedulerOutput(
            prev_sample=prev_sample, pred_original_sample=pred_original.astype(model_output.dtype), state=state
        )

    def undo_step(self, state, sample, timestep, key: Optional[jax.Array] = None, noises: Optional[jax.Array] = None):
        """Re-noise forward by one (coarse) step: n sub-steps of
        x ← √(1−β)·x + √β·ε. `noises` is [n, *shape] or a key is folded per
        sub-step."""
        n = self.config.num_train_timesteps // state.num_inference_steps
        t = jnp.asarray(timestep, dtype=jnp.int32)
        x = sample.astype(jnp.float32)
        for i in range(n):
            beta = state.betas[t + i]
            if noises is not None:
                eps = noises[i].astype(jnp.float32)
            else:
                if key is None:
                    raise ValueError("undo_step requires a PRNG key or noises")
                eps = randn_tensor(sample.shape, key=jax.random.fold_in(key, i), dtype=jnp.float32)
            x = (1 - beta) ** 0.5 * x + beta**0.5 * eps
        return x.astype(sample.dtype)

    def __len__(self):
        return self.config.num_train_timesteps
