"""Entropy-bound token scheduler — functional TPU-native.

Numerics follow the reference `scheduling_entropy_bound.py:50`
(EntropyBoundScheduler, paper 2505.24857): temperature annealed from t_max
to t_min, per-position candidates sampled from the temperature-scaled
logits, and the k lowest-entropy positions accepted such that
`cumsum(entropy) − running_max ≤ entropy_bound`; the rest renoise with
uniform random tokens. Explicit PRNG keys.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax
import jax
import jax.numpy as jnp

from ..configuration_utils import ConfigMixin, register_to_config
from ..utils import BaseOutput
from .scheduling_utils import SchedulerMixin


@flax.struct.dataclass
class EntropyBoundSchedulerState:
    timesteps: jax.Array
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class EntropyBoundSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    accepted_index: jax.Array
    sampled_tokens: jax.Array
    sampled_probs: jax.Array
    pred_logits: jax.Array
    state: Optional[EntropyBoundSchedulerState] = None


class EntropyBoundScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(self, entropy_bound: float = 0.1, t_max: float = 0.8, t_min: float = 0.4,
                 num_inference_steps: int = 32):
        pass

    def set_timesteps(self, num_inference_steps: int) -> EntropyBoundSchedulerState:
        if num_inference_steps <= 0:
            raise ValueError(f"`num_inference_steps` must be > 0, got {num_inference_steps}.")
        return EntropyBoundSchedulerState(
            timesteps=jnp.arange(num_inference_steps, dtype=jnp.int32),
            num_inference_steps=num_inference_steps,
        )

    def step(
        self,
        state: EntropyBoundSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        entropy_bound: Optional[float] = None,
        key: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        if entropy_bound is None:
            entropy_bound = float(self.config.entropy_bound)
        if key is None:
            key = jax.random.PRNGKey(0)
        k_tok, k_noise = jax.random.split(key)

        num_steps = float(state.num_inference_steps)
        fraction = (num_steps - jnp.asarray(timestep, jnp.float32)) / num_steps
        temperature = self.config.t_min + (self.config.t_max - self.config.t_min) * fraction
        scaled = model_output / temperature

        probs = jax.nn.softmax(scaled.astype(jnp.float32), axis=-1)
        sampled_tokens = jax.random.categorical(k_tok, scaled.astype(jnp.float32), axis=-1)
        sampled_tokens = sampled_tokens.astype(sample.dtype)
        sampled_probs = jnp.take_along_axis(probs, sampled_tokens[..., None], axis=-1)[..., 0]

        log_probs = jax.nn.log_softmax(scaled.astype(jnp.float32), axis=-1)
        token_entropy = -jnp.sum(probs * log_probs, axis=-1)  # [B, L]
        sort_idx = jnp.argsort(token_entropy, axis=-1)
        sorted_entropy = jnp.take_along_axis(token_entropy, sort_idx, axis=-1)
        cumulative = jnp.cumsum(sorted_entropy, axis=-1)
        sorted_accepted = (cumulative - sorted_entropy) <= entropy_bound
        accepted_index = jnp.put_along_axis(
            jnp.zeros_like(sorted_accepted), sort_idx, sorted_accepted, axis=-1, inplace=False)

        random_tokens = jax.random.randint(k_noise, sample.shape, 0, model_output.shape[-1])
        prev_sample = jnp.where(accepted_index, sampled_tokens, random_tokens.astype(sample.dtype))

        if not return_dict:
            return prev_sample, accepted_index, sampled_tokens, sampled_probs, scaled, state
        return EntropyBoundSchedulerOutput(
            prev_sample=prev_sample, accepted_index=accepted_index,
            sampled_tokens=sampled_tokens, sampled_probs=sampled_probs,
            pred_logits=scaled, state=state)


__all__ = ["EntropyBoundScheduler", "EntropyBoundSchedulerOutput", "EntropyBoundSchedulerState"]
