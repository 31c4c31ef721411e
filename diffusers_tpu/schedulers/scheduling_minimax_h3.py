"""MiniMax-H3 rectified-flow Euler scheduler.

Numerics follow the reference
(`/root/reference/src/diffusers/schedulers/scheduling_minimax_h3.py:55`
MiniMaxH3Scheduler): DATA-WARD velocity (`x0 = x_t + σ·v`, note the `+`),
timesteps `t = 1 − σ` in [0, 1] with t=1 clean, sigma grid
`linspace(1, 0, N)` through the exponential shift with consecutive
duplicates collapsed, Euler blend `x_next = r·x_t + (1 − r)·x0` with
`r = σ_next/σ` in float32. The reference deliberately derives the x0 sigma
from the TIMESTEP (`1 − t`) while the Euler ratio uses the sigma grid —
both are kept apart here too. Two instances per request (video shift 12,
audio shift 3).
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
from .scheduling_utils import SchedulerMixin


@flax.struct.dataclass
class MiniMaxH3SchedulerState:
    timesteps: jax.Array  # t = 1 - sigma, ascending in t
    sigmas: jax.Array
    step_index: jax.Array
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class MiniMaxH3SchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[MiniMaxH3SchedulerState] = None


class MiniMaxH3Scheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(self, shift: float = 12.0):
        if shift <= 0:
            raise ValueError(f"`shift` must be positive, got {shift}.")
        self._shift = float(shift)

    @property
    def shift(self) -> float:
        return self._shift

    def set_shift(self, shift: float) -> None:
        if shift <= 0:
            raise ValueError(f"`shift` must be positive, got {shift}.")
        self._shift = float(shift)

    def set_timesteps(self, num_inference_steps: Optional[int] = None,
                      sigmas: Optional[List[float]] = None) -> MiniMaxH3SchedulerState:
        if sigmas is None:
            if num_inference_steps is None or num_inference_steps < 2:
                raise ValueError("need `sigmas` or `num_inference_steps` >= 2")
            base = np.linspace(1.0, 0.0, int(num_inference_steps), dtype=np.float32)
            sigmas = self._shift * base / (1 + (self._shift - 1) * base)
            # collapse consecutive duplicates (reference torch.unique_consecutive)
            keep = np.concatenate([[True], sigmas[1:] != sigmas[:-1]])
            sigmas = sigmas[keep]
        else:
            sigmas = np.asarray(sigmas, np.float32).reshape(-1)
            if sigmas.size < 2 or not np.all(sigmas[1:] < sigmas[:-1]) or sigmas[-1] != 0.0:
                raise ValueError("`sigmas` must hold >= 2 strictly decreasing values ending at 0.0")
        return MiniMaxH3SchedulerState(
            timesteps=jnp.asarray(1.0 - sigmas[:-1], jnp.float32),
            sigmas=jnp.asarray(sigmas, jnp.float32),
            step_index=jnp.asarray(0, jnp.int32),
            num_inference_steps=len(sigmas) - 1)

    def scale_noise(self, sample: jax.Array, timestep, noise: jax.Array) -> jax.Array:
        """`x_t = t·x0 + (1 − t)·noise` — t taken at face value (reference `:185`)."""
        t = jnp.asarray(timestep, sample.dtype)
        t = t.reshape(t.shape + (1,) * (sample.ndim - t.ndim))
        return t * sample + (1.0 - t) * noise

    def scale_model_input(self, state, sample, timestep=None):
        return sample

    def step(self, state: MiniMaxH3SchedulerState, model_output: jax.Array, timestep,
             sample: jax.Array, return_dict: bool = True):
        # x0 from the timestep-derived sigma (NOT the grid — reference keeps them apart)
        sigma_from_t = (1.0 - jnp.asarray(timestep, sample.dtype))
        denoised = sample + sigma_from_t * model_output

        i = state.step_index
        sigma = state.sigmas[i].astype(jnp.float32)
        sigma_next = state.sigmas[i + 1].astype(jnp.float32)
        ratio = sigma_next / sigma
        prev = (ratio * sample.astype(jnp.float32)
                + (1.0 - ratio) * denoised.astype(jnp.float32)).astype(sample.dtype)
        new_state = state.replace(step_index=i + 1)
        if not return_dict:
            return (prev, new_state)
        return MiniMaxH3SchedulerOutput(prev_sample=prev, state=new_state)

    def __len__(self):
        return 1000
