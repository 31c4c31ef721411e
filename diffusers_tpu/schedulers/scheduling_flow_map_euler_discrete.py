"""Flow-map Euler sampler (AnyFlow) — functional TPU-native.

Numerics follow the reference `scheduling_flow_map_euler_discrete.py:42`
(FlowMapEulerDiscreteScheduler, paper 2605.13724): a shifted linspace sigma
schedule with an appended terminal 0; `step` advances `z_t → z_r` along the
predicted mean velocity, `prev = sample − (σ_t − σ_r)·v`, where both
endpoints resolve by nearest-index lookup on the schedule (off-schedule
values fall back to `timestep / num_train_timesteps`) so any-step sampling
works inside a scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Union

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import ConfigMixin, register_to_config
from ..utils import BaseOutput
from .scheduling_utils import SchedulerMixin, broadcast_to_left


@flax.struct.dataclass
class FlowMapEulerDiscreteSchedulerState:
    timesteps: jax.Array  # [N]
    sigmas: jax.Array  # [N + 1]
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class FlowMapEulerDiscreteSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[FlowMapEulerDiscreteSchedulerState] = None


class FlowMapEulerDiscreteScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(self, num_train_timesteps: int = 1000, shift: float = 1.0):
        pass

    def apply_shift(self, sigmas: np.ndarray) -> np.ndarray:
        s = self.config.shift
        if s == 1.0:
            return sigmas
        return s * sigmas / (1 + (s - 1) * sigmas)

    def set_timesteps(self, num_inference_steps: Optional[int] = None,
                      sigmas: Optional[List[float]] = None,
                      timesteps: Optional[List[float]] = None) -> FlowMapEulerDiscreteSchedulerState:
        if sigmas is not None and timesteps is not None and len(sigmas) != len(timesteps):
            raise ValueError("`sigmas` and `timesteps` should have the same length")
        if num_inference_steps is None:
            if sigmas is not None:
                num_inference_steps = len(sigmas)
            elif timesteps is not None:
                num_inference_steps = len(timesteps)
            else:
                raise ValueError("`num_inference_steps` required without sigmas/timesteps")

        if sigmas is not None:
            working = np.asarray(sigmas, np.float64)
        elif timesteps is not None:
            working = np.asarray(timesteps, np.float64) / self.config.num_train_timesteps
        else:
            working = np.linspace(1.0, 0.0, num_inference_steps + 1, dtype=np.float64)[:-1]
        working = self.apply_shift(working)
        full = np.concatenate([working, [0.0]])
        return FlowMapEulerDiscreteSchedulerState(
            timesteps=jnp.asarray(full[:-1] * self.config.num_train_timesteps, jnp.float32),
            sigmas=jnp.asarray(full, jnp.float32),
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state, sample, timestep=None):
        return sample

    def scale_noise(self, state, sample, timestep, noise):
        t = jnp.asarray(timestep, sample.dtype) / self.config.num_train_timesteps
        t = broadcast_to_left(jnp.atleast_1d(t), sample.ndim)
        return t * noise + (1.0 - t) * sample

    def _sigma_for(self, state, timestep):
        """Nearest on-schedule sigma; off-schedule → t / num_train_timesteps."""
        t = jnp.asarray(timestep, jnp.float32).reshape(())
        diffs = jnp.abs(state.timesteps - t)
        idx = jnp.argmin(diffs)
        on_schedule = diffs[idx] <= 1e-3
        return jnp.where(on_schedule, state.sigmas[idx], t / self.config.num_train_timesteps), \
            jnp.where(on_schedule, idx, -1)

    def step(
        self,
        state: FlowMapEulerDiscreteSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        r_timestep=None,
        key: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        sigma_t, t_idx = self._sigma_for(state, timestep)
        if r_timestep is None:
            sigma_r = state.sigmas[jnp.clip(t_idx, 0, state.sigmas.shape[0] - 2) + 1]
        else:
            sigma_r, _ = self._sigma_for(state, r_timestep)
        prev = sample.astype(jnp.float32) - (sigma_t - sigma_r) * model_output.astype(jnp.float32)
        prev = prev.astype(model_output.dtype)
        if not return_dict:
            return (prev,)
        return FlowMapEulerDiscreteSchedulerOutput(prev_sample=prev, state=state)


__all__ = ["FlowMapEulerDiscreteScheduler", "FlowMapEulerDiscreteSchedulerOutput",
           "FlowMapEulerDiscreteSchedulerState"]
