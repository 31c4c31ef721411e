"""SCM (sCM TrigFlow consistency) sampler — functional TPU-native implementation.

Numerics follow the reference `scheduling_scm.py`
(`/root/reference/src/diffusers/schedulers/scheduling_scm.py:51` SCMScheduler;
trigflow step `:277-295`: ``x₀ = cos(s)·x − sin(s)·v`` then re-noise
``cos(t)·x₀ + sin(t)·σ_d·ε``; angle ladder `:set_timesteps`, π/2 → 0). Used by
SANA-Sprint. Steps take a PRNG key for the re-noise draw (scan-split)."""

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
from .scheduling_utils import SchedulerMixin, index_for_timestep


@flax.struct.dataclass
class SCMSchedulerState:
    timesteps: jax.Array  # float32 [S+1] (angles in [0, π/2])
    step_index: jax.Array
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class SCMSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    pred_original_sample: Optional[jax.Array] = None
    state: Optional[SCMSchedulerState] = None


class SCMScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        prediction_type: str = "trigflow",
        sigma_data: float = 0.5,
    ):
        if prediction_type != "trigflow":
            raise ValueError(f"Unsupported parameterization: {prediction_type}")
        self.init_noise_sigma = 1.0

    def set_timesteps(
        self,
        num_inference_steps: int,
        timesteps: Optional[List[float]] = None,
        max_timesteps: Optional[float] = 1.57080,
        intermediate_timesteps: Optional[float] = 1.3,
    ) -> SCMSchedulerState:
        if timesteps is not None:
            if len(timesteps) != num_inference_steps + 1:
                raise ValueError("custom `timesteps` must have length num_inference_steps + 1")
            ts = np.asarray(timesteps, dtype=np.float32)
        elif intermediate_timesteps is not None and num_inference_steps == 2:
            ts = np.asarray([max_timesteps, intermediate_timesteps, 0.0], dtype=np.float32)
        else:
            ts = np.linspace(max_timesteps, 0, num_inference_steps + 1, dtype=np.float32)
        return SCMSchedulerState(
            timesteps=jnp.asarray(ts),
            step_index=jnp.asarray(0, jnp.int32),
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state, sample, timestep=None):
        return sample

    def step(self, state, model_output, timestep, sample, key: Optional[jax.Array] = None,
             return_dict: bool = True):
        if state.num_inference_steps is None:
            raise ValueError("run set_timesteps before step")
        idx = state.step_index
        s = state.timesteps[idx]
        t = state.timesteps[idx + 1]

        sample_f = sample.astype(jnp.float32)
        v = model_output.astype(jnp.float32)
        pred_x0 = jnp.cos(s) * sample_f - jnp.sin(s) * v

        if state.timesteps.shape[0] > 2:  # multi-step: re-noise toward angle t
            if key is None:
                raise ValueError("SCM multi-step sampling needs a PRNG key for the re-noise draw")
            noise = randn_tensor(pred_x0.shape, key=key, dtype=jnp.float32) * self.config.sigma_data
            prev_sample = jnp.cos(t) * pred_x0 + jnp.sin(t) * noise
        else:
            prev_sample = pred_x0

        prev_sample = prev_sample.astype(sample.dtype)
        new_state = state.replace(step_index=idx + 1)
        if not return_dict:
            return (prev_sample, new_state)
        return SCMSchedulerOutput(
            prev_sample=prev_sample, pred_original_sample=pred_x0.astype(sample.dtype), state=new_state
        )

    def __len__(self):
        return self.config.num_train_timesteps
