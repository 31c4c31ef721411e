"""aMUSEd mask-git token scheduler — functional TPU-native.

Numerics follow the reference `scheduling_amused.py:79` (AmusedScheduler):
per-step multinomial unmasking, cosine/linear mask-ratio schedules, and
confidence-ordered re-masking via temperature-scaled Gumbel noise
(`mask_by_random_topk`, `:31`). Randomness comes from an explicit PRNG key so
`step` is pure for `lax.scan`; token ids stay int32 throughout.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple, Union

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import ConfigMixin, register_to_config
from ..utils import BaseOutput
from .scheduling_utils import SchedulerMixin


def gumbel_noise(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    u = jax.random.uniform(key, shape, dtype=dtype)
    return -jnp.log(jnp.clip(-jnp.log(jnp.clip(u, 1e-20)), 1e-20))


def mask_by_random_topk(key: jax.Array, mask_len: jax.Array, probs: jax.Array,
                        temperature: jax.Array) -> jax.Array:
    confidence = jnp.log(jnp.clip(probs, 1e-20)) + temperature * gumbel_noise(key, probs.shape, probs.dtype)
    sorted_confidence = jnp.sort(confidence, axis=-1)
    cut_off = jnp.take_along_axis(sorted_confidence, mask_len.astype(jnp.int32), axis=1)
    return confidence < cut_off


@flax.struct.dataclass
class AmusedSchedulerState:
    timesteps: jax.Array  # [S] descending step indices
    temperatures: jax.Array  # [S]
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class AmusedSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[AmusedSchedulerState] = None


class AmusedScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(self, mask_token_id: int, masking_schedule: str = "cosine"):
        pass

    def set_timesteps(self, num_inference_steps: int,
                      temperature: Union[float, Tuple[float, float]] = (2, 0)):
        timesteps = np.arange(num_inference_steps)[::-1].copy()
        if isinstance(temperature, (tuple, list)):
            temps = np.linspace(temperature[0], temperature[1], num_inference_steps)
        else:
            temps = np.linspace(temperature, 0.01, num_inference_steps)
        return AmusedSchedulerState(
            timesteps=jnp.asarray(timesteps, jnp.int32),
            temperatures=jnp.asarray(temps, jnp.float32),
            num_inference_steps=num_inference_steps,
        )

    def _mask_ratio(self, ratio: jax.Array) -> jax.Array:
        if self.config.masking_schedule == "cosine":
            return jnp.cos(ratio * math.pi / 2)
        if self.config.masking_schedule == "linear":
            return 1 - ratio
        raise ValueError(f"unknown masking schedule {self.config.masking_schedule}")

    def step(self, state: AmusedSchedulerState, model_output: jax.Array, timestep,
             sample: jax.Array, key: jax.Array, starting_mask_ratio: float = 1.0,
             return_dict: bool = True):
        """model_output: [B, S, codebook] logits (or [B, codebook, H, W]);
        sample: [B, S] (or [B, H, W]) token ids."""
        two_dim = sample.ndim == 3 and model_output.ndim == 4
        if two_dim:
            b, codebook, h, w = model_output.shape
            sample = sample.reshape(b, h * w)
            model_output = jnp.transpose(model_output.reshape(b, codebook, h * w), (0, 2, 1))

        unknown_map = sample == self.config.mask_token_id
        probs = jax.nn.softmax(model_output, axis=-1)

        key, cat_key, mask_key = jax.random.split(key, 3)
        sampled = jax.random.categorical(cat_key, jnp.log(jnp.clip(probs, 1e-20)), axis=-1)
        pred_original_sample = jnp.where(unknown_map, sampled.astype(sample.dtype), sample)

        t = jnp.asarray(timestep)
        step_idx = jnp.argmax(state.timesteps == t)
        ratio = (step_idx + 1) / state.timesteps.shape[0]
        mask_ratio = starting_mask_ratio * self._mask_ratio(ratio)

        seq_len = sample.shape[1]
        mask_len = jnp.floor(seq_len * mask_ratio)
        mask_len = jnp.minimum(unknown_map.sum(axis=-1, keepdims=True) - 1, mask_len)
        mask_len = jnp.maximum(1, mask_len)

        selected_probs = jnp.take_along_axis(probs, pred_original_sample[:, :, None].astype(jnp.int32), axis=-1)[..., 0]
        selected_probs = jnp.where(unknown_map, selected_probs, jnp.finfo(selected_probs.dtype).max)

        masking = mask_by_random_topk(mask_key, mask_len, selected_probs, state.temperatures[step_idx])
        masked = jnp.where(masking, self.config.mask_token_id, pred_original_sample)
        # reference: timestep 0 returns the fully unmasked prediction
        prev_sample = jnp.where(t == 0, pred_original_sample, masked)

        if two_dim:
            prev_sample = prev_sample.reshape(b, h, w)
            pred_original_sample = pred_original_sample.reshape(b, h, w)

        if not return_dict:
            return (prev_sample, pred_original_sample)
        return AmusedSchedulerOutput(prev_sample, pred_original_sample, state)

    def add_noise(self, state: AmusedSchedulerState, sample: jax.Array, timesteps,
                  key: jax.Array) -> jax.Array:
        step_idx = jnp.argmax(state.timesteps == jnp.asarray(timesteps))
        ratio = (step_idx + 1) / state.timesteps.shape[0]
        mask_ratio = self._mask_ratio(ratio)
        mask_indices = jax.random.uniform(key, sample.shape) < mask_ratio
        return jnp.where(mask_indices, self.config.mask_token_id, sample)
