"""Improved PNDM (fourth-order pseudo linear multistep) — functional TPU-native.

Numerics follow the reference `scheduling_ipndm.py`: cosine-parametrized
alpha/beta ladders on a linspace(1→0) grid, Adams–Bashforth blending of up to
four buffered `ets` terms, carried in the state as a [4, *shape] ring.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import ConfigMixin, register_to_config
from ..utils import BaseOutput
from .scheduling_utils import SchedulerMixin


@flax.struct.dataclass
class IPNDMSchedulerState:
    timesteps: jax.Array  # [S] float
    alphas: jax.Array  # [S+1]
    betas: jax.Array  # [S+1]
    step_index: jax.Array
    ets: Optional[jax.Array]  # [4, *shape], newest at -1
    ets_count: jax.Array
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class IPNDMSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[IPNDMSchedulerState] = None


class IPNDMScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(self, num_train_timesteps: int = 1000, trained_betas: Optional[List[float]] = None):
        pass

    def set_timesteps(self, num_inference_steps: int, sample_shape: Optional[tuple] = None) -> IPNDMSchedulerState:
        steps = np.linspace(1, 0, num_inference_steps + 1, dtype=np.float64)[:-1]
        steps = np.concatenate([steps, [0.0]])
        if self.config.trained_betas is not None:
            betas = np.asarray(self.config.trained_betas, dtype=np.float64)
        else:
            betas = np.sin(steps * math.pi / 2) ** 2
        alphas = (1.0 - betas**2) ** 0.5
        timesteps = (np.arctan2(betas, alphas) / math.pi * 2)[:-1]

        ets = None
        if sample_shape is not None:
            ets = jnp.zeros((4, *sample_shape), dtype=jnp.float32)

        return IPNDMSchedulerState(
            timesteps=jnp.asarray(timesteps, dtype=jnp.float32),
            alphas=jnp.asarray(alphas, dtype=jnp.float32),
            betas=jnp.asarray(betas, dtype=jnp.float32),
            step_index=jnp.asarray(0, dtype=jnp.int32),
            ets=ets,
            ets_count=jnp.asarray(0, dtype=jnp.int32),
            num_inference_steps=num_inference_steps,
        )

    def prepare(self, state, sample):
        if state.ets is not None:
            return state
        return state.replace(ets=jnp.zeros((4, *sample.shape), dtype=jnp.float32))

    def scale_model_input(self, state, sample, timestep=None):
        return sample

    def step(self, state, model_output, timestep, sample, return_dict: bool = True):
        state = self.prepare(state, sample)
        idx = state.step_index

        sample_f = sample.astype(jnp.float32)
        mo = model_output.astype(jnp.float32)
        ets_new = sample_f * state.betas[idx] + mo * state.alphas[idx]
        ets_hist = jnp.concatenate([state.ets[1:], ets_new[None]], axis=0)
        count = state.ets_count + 1

        e0, e1, e2, e3 = ets_hist[-1], ets_hist[-2], ets_hist[-3], ets_hist[-4]
        blend = jnp.where(
            count == 1,
            e0,
            jnp.where(
                count == 2,
                (3 * e0 - e1) / 2,
                jnp.where(
                    count == 3,
                    (23 * e0 - 16 * e1 + 5 * e2) / 12,
                    (55 * e0 - 59 * e1 + 37 * e2 - 9 * e3) / 24,
                ),
            ),
        )

        alpha, sigma = state.alphas[idx], state.betas[idx]
        next_alpha, next_sigma = state.alphas[idx + 1], state.betas[idx + 1]
        pred = (sample_f - sigma * blend) / jnp.maximum(alpha, 1e-8)
        prev_sample = (next_alpha * pred + blend * next_sigma).astype(model_output.dtype)

        new_state = state.replace(step_index=idx + 1, ets=ets_hist, ets_count=count)
        if not return_dict:
            return (prev_sample, new_state)
        return IPNDMSchedulerOutput(prev_sample=prev_sample, state=new_state)

    def __len__(self):
        return self.config.num_train_timesteps
