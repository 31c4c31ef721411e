"""Flow-matching latent consistency sampler — functional TPU-native.

Numerics follow the reference `scheduling_flow_match_lcm.py:48`
(FlowMatchLCMScheduler): the same shifted flow-match sigma schedule as
FlowMatchEulerDiscrete (reused by subclassing), but the step is the LCM
re-noising update — `x0 = x_t - sigma * v`, then
`x_{t-1} = (1 - sigma_next) * x0 + sigma_next * fresh_noise` (`:480-492`).
Fresh noise comes from an explicit PRNG key (or `variance_noise`) so the step
is pure for `lax.scan`. The reference's mid-sampling upscale mode
(`set_scale_factors`) changes tensor shapes step-to-step and is rejected.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..configuration_utils import register_to_config
from ..utils.jax_utils import randn_tensor
from .scheduling_flow_match_euler_discrete import (
    FlowMatchEulerDiscreteScheduler,
    FlowMatchEulerDiscreteSchedulerOutput,
    FlowMatchEulerDiscreteSchedulerState,
    index_for_timestep,
)

FlowMatchLCMSchedulerState = FlowMatchEulerDiscreteSchedulerState
FlowMatchLCMSchedulerOutput = FlowMatchEulerDiscreteSchedulerOutput


class FlowMatchLCMScheduler(FlowMatchEulerDiscreteScheduler):
    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        shift: float = 1.0,
        use_dynamic_shifting: bool = False,
        base_shift: float = 0.5,
        max_shift: float = 1.15,
        base_image_seq_len: int = 256,
        max_image_seq_len: int = 4096,
        invert_sigmas: bool = False,
        shift_terminal: Optional[float] = None,
        use_karras_sigmas: bool = False,
        use_exponential_sigmas: bool = False,
        use_beta_sigmas: bool = False,
        time_shift_type: str = "exponential",
        scale_factors: Optional[list] = None,
        upscale_mode: str = "bicubic",
    ):
        if scale_factors:
            raise NotImplementedError(
                "mid-sampling upscaling (`scale_factors`) changes tensor shapes per step "
                "and cannot compile to a fixed-shape scan"
            )
        sigmas = jnp.linspace(1, num_train_timesteps, num_train_timesteps)[::-1] / num_train_timesteps
        if not use_dynamic_shifting:
            sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        self.sigma_min = float(sigmas[-1])
        self.sigma_max = float(sigmas[0])

    def step(
        self,
        state: FlowMatchLCMSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        key: Optional[jax.Array] = None,
        variance_noise: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        idx = index_for_timestep(state.timesteps, jnp.asarray(timestep, state.timesteps.dtype))
        sigma = state.sigmas[idx]
        sigma_next = state.sigmas[idx + 1]

        sample_f = sample.astype(jnp.float32)
        x0_pred = sample_f - sigma * model_output.astype(jnp.float32)

        if variance_noise is None:
            if key is None:
                raise ValueError("FlowMatchLCMScheduler.step needs a PRNG key or variance_noise")
            variance_noise = randn_tensor(x0_pred.shape, key=key, dtype=jnp.float32)
        prev_sample = (1 - sigma_next) * x0_pred + sigma_next * variance_noise.astype(jnp.float32)
        prev_sample = prev_sample.astype(model_output.dtype)

        if not return_dict:
            return (prev_sample, state)
        return FlowMatchLCMSchedulerOutput(prev_sample=prev_sample, state=state)
