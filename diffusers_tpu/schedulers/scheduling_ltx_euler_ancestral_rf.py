"""LTX Euler-Ancestral RF scheduler (ComfyUI-style CONST parametrization).

Numerics follow the reference
(`/root/reference/src/diffusers/schedulers/scheduling_ltx_euler_ancestral_rf.py:51`
LTXEulerAncestralRFScheduler): `x0 = x_t − σ·v`, downstep
`σ_down = σ_next·(1 + (σ_next/σ − 1)·eta)`, deterministic blend
`x = (σ_down/σ)·x_t + (1 − σ_down/σ)·x0`, then ancestral renoise
`x = (α_next/α_down)·x + noise·sqrt(max(σ_next² − σ_down²·α_next²/α_down², 0))·s_noise`
with α = 1 − σ; final step returns x0. When no explicit sigmas are given the
FlowMatchEulerDiscrete sigma logic builds the schedule from the same config.

TPU-first: flax state + explicit PRNG key; the terminal-step branch is a
`jnp.where`, so the whole sampler scans.
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
class LTXEulerAncestralRFSchedulerState:
    timesteps: jax.Array
    sigmas: jax.Array
    step_index: jax.Array
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class LTXEulerAncestralRFSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[LTXEulerAncestralRFSchedulerState] = None


class LTXEulerAncestralRFScheduler(SchedulerMixin, ConfigMixin):
    _compatibles = ["FlowMatchEulerDiscreteScheduler"]
    order = 1

    @register_to_config
    def __init__(self, num_train_timesteps: int = 1000, eta: float = 1.0,
                 s_noise: float = 1.0, **flow_match_kwargs):
        pass

    def set_timesteps(self, num_inference_steps: Optional[int] = None,
                      sigmas: Optional[List[float]] = None,
                      timesteps: Optional[List[float]] = None,
                      mu: Optional[float] = None) -> LTXEulerAncestralRFSchedulerState:
        if sigmas is None and timesteps is None:
            # delegate to the flow-match sigma builder with the shared config
            from .scheduling_flow_match_euler_discrete import FlowMatchEulerDiscreteScheduler

            cfg = {k: v for k, v in dict(self.config).items()
                   if not k.startswith("_") and k not in ("eta", "s_noise")}
            base = FlowMatchEulerDiscreteScheduler.from_config(cfg)
            st = base.set_timesteps(num_inference_steps=num_inference_steps, mu=mu)
            return LTXEulerAncestralRFSchedulerState(
                timesteps=st.timesteps, sigmas=st.sigmas,
                step_index=jnp.asarray(0, jnp.int32),
                num_inference_steps=num_inference_steps)

        if sigmas is None:
            sigmas = timesteps  # RF: timesteps ARE sigmas
        sigmas = np.asarray(sigmas, np.float32).reshape(-1)
        ts = sigmas * float(self.config.num_train_timesteps)
        return LTXEulerAncestralRFSchedulerState(
            timesteps=jnp.asarray(ts[:-1] if abs(sigmas[-1]) < 1e-6 else ts, jnp.float32),
            sigmas=jnp.asarray(sigmas, jnp.float32),
            step_index=jnp.asarray(0, jnp.int32),
            num_inference_steps=len(sigmas) - 1)

    def scale_model_input(self, state, sample, timestep=None):
        return sample

    def step(self, state: LTXEulerAncestralRFSchedulerState, model_output: jax.Array,
             timestep, sample: jax.Array, key: Optional[jax.Array] = None,
             return_dict: bool = True):
        i = state.step_index
        n = state.sigmas.shape[0]
        sample_f = sample.astype(jnp.float32)
        v = model_output.astype(jnp.float32)

        sigma = state.sigmas[jnp.minimum(i, n - 2)]
        sigma_next = state.sigmas[jnp.minimum(i + 1, n - 1)]
        denoised = sample_f - sigma * v

        eta = float(self.config.eta)
        s_noise = float(self.config.s_noise)
        downstep_ratio = 1.0 + (sigma_next / sigma - 1.0) * eta
        sigma_down = sigma_next * downstep_ratio
        alpha_next = 1.0 - sigma_next
        alpha_down = 1.0 - sigma_down

        sigma_ratio = sigma_down / sigma
        x = sigma_ratio * sample_f + (1.0 - sigma_ratio) * denoised
        if eta > 0.0 and s_noise > 0.0:
            renoise = jnp.sqrt(jnp.clip(
                sigma_next**2 - sigma_down**2 * alpha_next**2 / (alpha_down**2 + 1e-12), 0.0))
            if key is None:
                key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            noise = jax.random.normal(key, sample_f.shape, jnp.float32)
            x = (alpha_next / (alpha_down + 1e-12)) * x + noise * renoise * s_noise

        # terminal step -> pure x0; past-the-end -> identity
        x = jnp.where(jnp.abs(sigma_next) < 1e-8, denoised, x)
        prev = jnp.where(i >= n - 1, sample_f, x).astype(sample.dtype)
        new_state = state.replace(step_index=jnp.minimum(i + 1, n - 1))
        if not return_dict:
            return (prev, new_state)
        return LTXEulerAncestralRFSchedulerOutput(prev_sample=prev, state=new_state)

    def __len__(self):
        return int(self.config.num_train_timesteps)
