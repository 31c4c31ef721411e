"""Discrete DDIM scheduler for uniform-corruption token diffusion —
functional TPU-native.

Numerics follow the reference `scheduling_discrete_ddim.py:47`
(DiscreteDDIMScheduler, D3PM uniform kernel): each step samples every
position from the exact posterior q(x_s | x_t, x0) decomposed into
clean/stay/noise routes, with `alpha(t) = 1 - t` on a linear grid. The
optional leave-one-out Gibbs corrector (`step_correct`, paper 2605.22765)
resamples the least-confident `corrector_k` positions from the
one-coordinate conditional. Explicit PRNG keys; float64 LOO math is done in
float32 + logaddexp (JAX x64 is off by default — tolerance ~1e-6 vs the
reference's double path).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import flax
import jax
import jax.numpy as jnp

from ..configuration_utils import ConfigMixin, register_to_config
from ..utils import BaseOutput
from .scheduling_utils import SchedulerMixin


@flax.struct.dataclass
class DiscreteDDIMSchedulerState:
    timesteps: jax.Array  # [S] ascending 0..S-1
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class DiscreteDDIMSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    sampled_tokens: jax.Array
    sampled_probs: jax.Array
    pred_logits: jax.Array
    state: Optional[DiscreteDDIMSchedulerState] = None


def _sample_tokens(logits: jax.Array, temperature: float, key: Optional[jax.Array]):
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if temperature == 0.0:
        token = jnp.argmax(logits, axis=-1)
    else:
        token = jax.random.categorical(key, logits.astype(jnp.float32) / temperature, axis=-1)
    token_prob = jnp.take_along_axis(probs, token[..., None], axis=-1)[..., 0]
    return token, token_prob


class DiscreteDDIMScheduler(SchedulerMixin, ConfigMixin):
    """Uniform-kernel discrete DDIM with optional LOO Gibbs corrector."""

    order = 1

    @register_to_config
    def __init__(
        self,
        num_inference_steps: int = 32,
        corrector_steps: int = 0,
        corrector_k: int = 1,
        corrector_selection: str = "lowest_log_margin",
        corrector_selection_tau: float = 1.0,
    ):
        pass

    def set_timesteps(self, num_inference_steps: int) -> DiscreteDDIMSchedulerState:
        if num_inference_steps <= 0:
            raise ValueError(f"`num_inference_steps` must be > 0, got {num_inference_steps}.")
        return DiscreteDDIMSchedulerState(
            timesteps=jnp.arange(num_inference_steps, dtype=jnp.int32),
            num_inference_steps=num_inference_steps,
        )

    @staticmethod
    def _to_loo_logits(logits: jax.Array, tokens: jax.Array, alpha) -> jax.Array:
        """Leave-one-out correction: subtract log(1 + K·α/(1−α)) from the
        observed token's logit (reference :130)."""
        K = logits.shape[-1]
        delta = jnp.log1p(K * alpha / (1.0 - alpha))
        onehot = jax.nn.one_hot(tokens, K, dtype=logits.dtype)
        shifted = logits - onehot * delta
        return jnp.where((alpha <= 0.0) | (alpha >= 1.0), logits, shifted)

    def step(
        self,
        state: DiscreteDDIMSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        temperature: float = 0.0,
        key: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        if key is None:
            key = jax.random.PRNGKey(0)
        k_tok, k_route, k_noise = jax.random.split(key, 3)
        sampled_tokens, sampled_probs = _sample_tokens(model_output, temperature, k_tok)
        sampled_tokens = sampled_tokens.astype(sample.dtype)

        step_index = jnp.asarray(timestep, jnp.float32)
        num_steps = float(state.num_inference_steps)
        vocab = model_output.shape[-1]
        alpha_t = step_index / num_steps
        alpha_s = (step_index + 1) / num_steps
        survival = alpha_t / alpha_s

        same = (sample == sampled_tokens).astype(jnp.float32)
        clean_mass = alpha_s * (1 - survival) / vocab + survival * alpha_s * same
        stay_mass = jnp.broadcast_to(survival * (1 - alpha_s) / vocab, same.shape)
        noise_mass = jnp.broadcast_to((1 - survival) * (1 - alpha_s) / vocab, same.shape)
        route_logits = jnp.log(jnp.clip(jnp.stack([clean_mass, stay_mass, noise_mass], axis=-1),
                                        1e-20))
        routes = jax.random.categorical(k_route, route_logits, axis=-1)

        random_tokens = jax.random.randint(k_noise, sample.shape, 0, vocab).astype(sample.dtype)
        prev_sample = jnp.where(routes == 0, sampled_tokens, sample)
        prev_sample = jnp.where(routes == 2, random_tokens, prev_sample)

        if not return_dict:
            return prev_sample, sampled_tokens, sampled_probs, model_output, state
        return DiscreteDDIMSchedulerOutput(
            prev_sample=prev_sample, sampled_tokens=sampled_tokens,
            sampled_probs=sampled_probs, pred_logits=model_output, state=state)

    def _select_positions(self, sample: jax.Array, cond_log_probs: jax.Array,
                          key: jax.Array) -> jax.Array:
        selection = self.config.corrector_selection
        batch, seq_len = sample.shape
        k_eff = min(max(1, int(self.config.corrector_k)), seq_len)

        if selection == "random":
            scores = jax.random.uniform(key, (batch, seq_len))
            return jax.lax.top_k(scores, k_eff)[1]
        if selection == "lowest_maxprob":
            confidence = -jnp.max(cond_log_probs, axis=-1)
        elif selection == "lowest_current_prob":
            confidence = -jnp.take_along_axis(cond_log_probs, sample[..., None], axis=-1)[..., 0]
        elif selection == "lowest_log_margin":
            log_current = jnp.take_along_axis(cond_log_probs, sample[..., None], axis=-1)[..., 0]
            onehot = jax.nn.one_hot(sample, cond_log_probs.shape[-1], dtype=bool)
            alt = jnp.where(onehot, -jnp.inf, cond_log_probs)
            confidence = -(log_current - jnp.max(alt, axis=-1))
        else:
            raise ValueError(f"Unknown `corrector_selection`: {selection!r}.")

        keys = confidence / float(self.config.corrector_selection_tau)
        u = jnp.clip(jax.random.uniform(key, keys.shape), 1e-12, 1.0 - 1e-12)
        keys = keys + (-jnp.log(-jnp.log(u)))
        return jax.lax.top_k(keys, k_eff)[1]

    def step_correct(
        self,
        state: DiscreteDDIMSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        key: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        """One LOO Gibbs sweep at the post-predictor time s (reference :241)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        k_sel, k_res = jax.random.split(key)
        step_index = jnp.asarray(timestep, jnp.float32)
        alpha_s = (step_index + 1) / float(state.num_inference_steps)
        vocab = model_output.shape[-1]

        loo_logits = self._to_loo_logits(model_output.astype(jnp.float32), sample, alpha_s)
        loo_log_probs = jax.nn.log_softmax(loo_logits, axis=-1)
        log_uniform = jnp.log1p(-alpha_s) - math.log(vocab)
        cond_log_probs = jnp.logaddexp(jnp.log(alpha_s) + loo_log_probs,
                                       jnp.broadcast_to(log_uniform, loo_log_probs.shape))

        positions = self._select_positions(sample, cond_log_probs, k_sel)
        rows = jnp.broadcast_to(jnp.arange(sample.shape[0])[:, None], positions.shape)
        chosen_log_probs = cond_log_probs[rows, positions]
        resampled = jax.random.categorical(k_res, chosen_log_probs, axis=-1).astype(sample.dtype)

        prev_sample = sample.at[rows, positions].set(resampled)
        sampled_probs = jnp.exp(
            jnp.take_along_axis(chosen_log_probs, resampled[..., None], axis=-1)[..., 0])

        if not return_dict:
            return prev_sample, resampled, sampled_probs, model_output, state
        return DiscreteDDIMSchedulerOutput(
            prev_sample=prev_sample, sampled_tokens=resampled,
            sampled_probs=sampled_probs, pred_logits=model_output, state=state)


__all__ = ["DiscreteDDIMScheduler", "DiscreteDDIMSchedulerOutput", "DiscreteDDIMSchedulerState"]
