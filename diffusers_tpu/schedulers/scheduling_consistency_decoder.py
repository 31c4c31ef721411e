"""Consistency-decoder 2-step sampler — functional TPU-native.

Numerics follow the reference `scheduling_consistency_decoder.py:79`
(ConsistencyDecoderScheduler): cosine alpha-bar ladder, EDM-style
c_in/c_skip/c_out tables indexed by raw timesteps, fixed [1008, 512] 2-step
schedule, re-noising to the next timestep between the two consistency calls.
Fresh noise comes from an explicit PRNG key so `step` is pure for `lax.scan`.
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
from .scheduling_utils import SchedulerMixin, betas_for_alpha_bar


@flax.struct.dataclass
class ConsistencyDecoderSchedulerState:
    timesteps: jax.Array  # [2] = [1008, 512]
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    c_skip: jax.Array
    c_out: jax.Array
    c_in: jax.Array
    init_noise_sigma: jax.Array
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class ConsistencyDecoderSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[ConsistencyDecoderSchedulerState] = None


class ConsistencyDecoderScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(self, num_train_timesteps: int = 1024, sigma_data: float = 0.5):
        betas = betas_for_alpha_bar(num_train_timesteps)
        alphas_cumprod = np.cumprod(1.0 - betas)
        self._sqrt_alphas_cumprod = np.sqrt(alphas_cumprod)
        self._sqrt_one_minus = np.sqrt(1.0 - alphas_cumprod)
        sigmas = np.sqrt(1.0 / alphas_cumprod - 1)
        sqrt_recip = np.sqrt(1.0 / alphas_cumprod)
        self._c_skip = sqrt_recip * sigma_data**2 / (sigmas**2 + sigma_data**2)
        self._c_out = sigmas * sigma_data / (sigmas**2 + sigma_data**2) ** 0.5
        self._c_in = sqrt_recip / (sigmas**2 + sigma_data**2) ** 0.5

    def set_timesteps(self, num_inference_steps: Optional[int] = None) -> ConsistencyDecoderSchedulerState:
        if num_inference_steps != 2:
            raise ValueError("Currently more than 2 inference steps are not supported.")
        timesteps = jnp.asarray([1008, 512], jnp.int32)
        return ConsistencyDecoderSchedulerState(
            timesteps=timesteps,
            sqrt_alphas_cumprod=jnp.asarray(self._sqrt_alphas_cumprod, jnp.float32),
            sqrt_one_minus_alphas_cumprod=jnp.asarray(self._sqrt_one_minus, jnp.float32),
            c_skip=jnp.asarray(self._c_skip, jnp.float32),
            c_out=jnp.asarray(self._c_out, jnp.float32),
            c_in=jnp.asarray(self._c_in, jnp.float32),
            init_noise_sigma=jnp.asarray(self._sqrt_one_minus[1008], jnp.float32),
            num_inference_steps=2,
        )

    def scale_model_input(self, state, sample: jax.Array, timestep) -> jax.Array:
        return sample * state.c_in[jnp.asarray(timestep, jnp.int32)]

    def step(self, state, model_output: jax.Array, timestep, sample: jax.Array,
             key: Optional[jax.Array] = None, variance_noise: Optional[jax.Array] = None,
             return_dict: bool = True):
        t = jnp.asarray(timestep, jnp.int32)
        x_0 = state.c_out[t] * model_output + state.c_skip[t] * sample
        idx = jnp.argmax(state.timesteps == t)
        is_last = idx == state.timesteps.shape[0] - 1

        if variance_noise is None:
            if key is None:
                raise ValueError("ConsistencyDecoderScheduler.step needs a PRNG key or variance_noise")
            variance_noise = randn_tensor(x_0.shape, key=key, dtype=x_0.dtype)
        next_t = state.timesteps[jnp.minimum(idx + 1, state.timesteps.shape[0] - 1)]
        renoised = (
            state.sqrt_alphas_cumprod[next_t].astype(x_0.dtype) * x_0
            + state.sqrt_one_minus_alphas_cumprod[next_t].astype(x_0.dtype) * variance_noise
        )
        prev_sample = jnp.where(is_last, x_0, renoised)

        if not return_dict:
            return (prev_sample,)
        return ConsistencyDecoderSchedulerOutput(prev_sample=prev_sample, state=state)
