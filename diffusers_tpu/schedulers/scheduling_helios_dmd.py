"""HeliosDMDScheduler — few-step DMD sampler for distilled Helios models.

Numerics follow the reference
(`/root/reference/src/diffusers/schedulers/scheduling_helios_dmd.py:35`
HeliosDMDScheduler): the same staged flow ladder as `HeliosScheduler`, but
stepping is pure DMD — convert the flow prediction to x0 with the
nearest-timestep sigma (`:274`) and re-noise to the next timestep with a
FIXED noise tensor (`:285`), except at the last step.

TPU-first: the step is a stateless pure function of
(sample, model_output, timestep, next_timestep, noise) — it carries only an
integer step index, so it folds directly into a scanned denoise loop.
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
from .scheduling_helios import HeliosScheduler
from .scheduling_utils import SchedulerMixin


@flax.struct.dataclass
class HeliosDMDSchedulerState:
    timesteps: jax.Array
    sigmas: jax.Array
    step_index: jax.Array
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class HeliosDMDSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[HeliosDMDSchedulerState] = None


class HeliosDMDScheduler(SchedulerMixin, ConfigMixin):
    order = 1

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        shift: float = 1.0,
        stages: int = 3,
        stage_range: List[float] = [0, 1 / 3, 2 / 3, 1],
        gamma: float = 1 / 3,
        prediction_type: str = "flow_prediction",
        use_flow_sigmas: bool = True,
        use_dynamic_shifting: bool = False,
        time_shift_type: str = "linear",
    ):
        # the stage tables are identical to HeliosScheduler's (reference `:87`)
        helper = HeliosScheduler(
            num_train_timesteps=num_train_timesteps, shift=shift, stages=stages,
            stage_range=stage_range, gamma=gamma, use_dynamic_shifting=use_dynamic_shifting,
            time_shift_type=time_shift_type, scheduler_type="dmd")
        self._helper = helper
        self.sigmas_global = helper.sigmas_global
        self.timesteps_global = helper.timesteps_global
        self.timesteps_per_stage = helper.timesteps_per_stage
        self.sigmas_per_stage = helper.sigmas_per_stage
        self.start_sigmas = helper.start_sigmas
        self.end_sigmas = helper.end_sigmas
        self.ori_start_sigmas = helper.ori_start_sigmas

    def time_shift(self, mu, sigma, t):
        if self.config.time_shift_type == "exponential":
            return math.exp(mu) / (math.exp(mu) + (1 / t - 1) ** sigma)
        return mu / (mu + (1 / t - 1) ** sigma)

    def set_timesteps(
        self,
        num_inference_steps: int,
        stage_index: Optional[int] = None,
        sigmas: Optional[np.ndarray] = None,
        mu: Optional[float] = None,
        is_amplify_first_chunk: bool = False,
    ) -> HeliosDMDSchedulerState:
        st = self._helper.set_timesteps(
            num_inference_steps, stage_index=stage_index, sigmas=sigmas, mu=mu,
            is_amplify_first_chunk=is_amplify_first_chunk)
        return HeliosDMDSchedulerState(
            timesteps=st.timesteps, sigmas=st.sigmas,
            step_index=jnp.asarray(0, jnp.int32),
            num_inference_steps=int(st.timesteps.shape[0]))

    @staticmethod
    def _sigma_for(timestep, sigmas, timesteps):
        """Nearest-timestep sigma lookup (reference `:269` argmin)."""
        ts = jnp.atleast_1d(jnp.asarray(timestep, jnp.float32))
        idx = jnp.argmin(jnp.abs(timesteps[None, :] - ts[:, None]), axis=1)
        return sigmas[idx]

    def add_noise(self, original_samples, noise, timestep, sigmas, timesteps):
        sigma = self._sigma_for(timestep, sigmas, timesteps)
        sigma = sigma.reshape((-1,) + (1,) * (original_samples.ndim - 1))
        return ((1 - sigma) * original_samples.astype(jnp.float32)
                + sigma * noise.astype(jnp.float32)).astype(noise.dtype)

    def convert_flow_pred_to_x0(self, flow_pred, xt, timestep, sigmas, timesteps):
        sigma_t = self._sigma_for(timestep, sigmas, timesteps)
        sigma_t = sigma_t.reshape((-1,) + (1,) * (flow_pred.ndim - 1))
        x0 = xt.astype(jnp.float32) - sigma_t * flow_pred.astype(jnp.float32)
        return x0.astype(flow_pred.dtype)

    def step(
        self,
        state: HeliosDMDSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        dmd_noisy_tensor: Optional[jax.Array] = None,
        dmd_sigmas: Optional[jax.Array] = None,
        dmd_timesteps: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        """DMD step (reference `:285`): x0 from the flow pred, re-noised to the
        next schedule timestep with the provided fixed noise, except last."""
        dmd_sigmas = state.sigmas if dmd_sigmas is None else dmd_sigmas
        dmd_timesteps = state.timesteps if dmd_timesteps is None else dmd_timesteps
        b = model_output.shape[0]
        t_full = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32), (b,))
        x0 = self.convert_flow_pred_to_x0(model_output, sample, t_full, dmd_sigmas, dmd_timesteps)

        idx = state.step_index
        n = state.timesteps.shape[0]
        next_t = state.timesteps[jnp.minimum(idx + 1, n - 1)]
        if dmd_noisy_tensor is None:
            dmd_noisy_tensor = jnp.zeros_like(sample)
        renoised = self.add_noise(
            x0, dmd_noisy_tensor, jnp.broadcast_to(next_t, (b,)), dmd_sigmas, dmd_timesteps)
        prev = jnp.where(idx < n - 1, renoised, x0)

        new_state = state.replace(step_index=idx + 1)
        if not return_dict:
            return (prev, new_state)
        return HeliosDMDSchedulerOutput(prev_sample=prev, state=new_state)

    def __len__(self):
        return self.config.num_train_timesteps
