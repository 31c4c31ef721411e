"""Flow-matching Euler sampler (rectified flow; SD3/Flux/Wan/LTX backbone).

Numerics follow the reference `scheduling_flow_match_euler_discrete.py`
(`/root/reference/src/diffusers/schedulers/scheduling_flow_match_euler_discrete.py:48`;
shift at `:132`, dynamic mu-shift `:241,646-650`, step `:423-523`:
``x ← x + (σ_next − σ)·v``). Pure-functional: the whole denoise loop scans
over `state.timesteps` with the step index recovered by value match.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Union

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..configuration_utils import ConfigMixin, register_to_config
from ..utils import BaseOutput
from ..utils.jax_utils import randn_tensor
from .scheduling_utils import SchedulerMixin, broadcast_to_left, index_for_timestep
from .sigma_utils import convert_to_beta, convert_to_exponential, convert_to_karras


@flax.struct.dataclass
class FlowMatchEulerDiscreteSchedulerState:
    timesteps: jax.Array  # float32 [S]
    sigmas: jax.Array  # float32 [S+1]
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class FlowMatchEulerDiscreteSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[FlowMatchEulerDiscreteSchedulerState] = None


class FlowMatchEulerDiscreteScheduler(SchedulerMixin, ConfigMixin):
    """Euler sampler for rectified-flow models."""

    _compatibles = []
    order = 1

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        shift: float = 1.0,
        use_dynamic_shifting: bool = False,
        base_shift: Optional[float] = 0.5,
        max_shift: Optional[float] = 1.15,
        base_image_seq_len: int = 256,
        max_image_seq_len: int = 4096,
        invert_sigmas: bool = False,
        shift_terminal: Optional[float] = None,
        use_karras_sigmas: bool = False,
        use_exponential_sigmas: bool = False,
        use_beta_sigmas: bool = False,
        time_shift_type: str = "exponential",
        stochastic_sampling: bool = False,
    ):
        if time_shift_type not in ("exponential", "linear"):
            raise ValueError("`time_shift_type` must be 'exponential' or 'linear'.")
        timesteps = np.linspace(1, num_train_timesteps, num_train_timesteps, dtype=np.float32)[::-1].copy()
        sigmas = timesteps / num_train_timesteps
        if not use_dynamic_shifting:
            sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        self.base_sigmas = sigmas
        self.sigma_min = float(sigmas[-1])
        self.sigma_max = float(sigmas[0])

    def _sigma_to_t(self, sigma):
        return sigma * self.config.num_train_timesteps

    def time_shift(self, mu: float, sigma: float, t: np.ndarray) -> np.ndarray:
        if self.config.time_shift_type == "exponential":
            return math.exp(mu) / (math.exp(mu) + (1 / t - 1) ** sigma)
        return mu / (mu + (1 / t - 1) ** sigma)

    def stretch_shift_to_terminal(self, t: np.ndarray) -> np.ndarray:
        one_minus_z = 1 - t
        scale_factor = one_minus_z[-1] / (1 - self.config.shift_terminal)
        return 1 - (one_minus_z / scale_factor)

    def set_timesteps(
        self,
        num_inference_steps: Optional[int] = None,
        sigmas: Optional[List[float]] = None,
        mu: Optional[float] = None,
        timesteps: Optional[List[float]] = None,
    ) -> FlowMatchEulerDiscreteSchedulerState:
        if self.config.use_dynamic_shifting and mu is None:
            raise ValueError("`mu` must be passed when `use_dynamic_shifting` is True")
        if sigmas is not None and timesteps is not None and len(sigmas) != len(timesteps):
            raise ValueError("`sigmas` and `timesteps` should have the same length")
        if num_inference_steps is None:
            num_inference_steps = len(sigmas) if sigmas is not None else len(timesteps)

        if sigmas is None:
            if timesteps is None:
                timesteps = np.linspace(
                    self._sigma_to_t(self.sigma_max), self._sigma_to_t(self.sigma_min), num_inference_steps
                )
            else:
                timesteps = np.array(timesteps).astype(np.float32)
            sigmas = timesteps / self.config.num_train_timesteps
        else:
            sigmas = np.array(sigmas).astype(np.float32)
            num_inference_steps = len(sigmas)

        if self.config.use_dynamic_shifting:
            sigmas = self.time_shift(mu, 1.0, sigmas)
        else:
            sigmas = self.config.shift * sigmas / (1 + (self.config.shift - 1) * sigmas)

        if self.config.shift_terminal:
            sigmas = self.stretch_shift_to_terminal(sigmas)

        if self.config.use_karras_sigmas:
            sigmas = convert_to_karras(sigmas, num_inference_steps)
        elif self.config.use_exponential_sigmas:
            sigmas = convert_to_exponential(sigmas, num_inference_steps)
        elif self.config.use_beta_sigmas:
            sigmas = convert_to_beta(sigmas, num_inference_steps)

        sigmas = np.asarray(sigmas, dtype=np.float32)
        timesteps = sigmas * self.config.num_train_timesteps

        if self.config.invert_sigmas:
            sigmas = 1.0 - sigmas
            timesteps = sigmas * self.config.num_train_timesteps
            sigmas = np.concatenate([sigmas, [1.0]]).astype(np.float32)
        else:
            sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)

        return FlowMatchEulerDiscreteSchedulerState(
            timesteps=jnp.asarray(timesteps, dtype=jnp.float32),
            sigmas=jnp.asarray(sigmas, dtype=jnp.float32),
            init_noise_sigma=1.0,
            num_inference_steps=num_inference_steps,
        )

    def scale_model_input(self, state, sample: jax.Array, timestep=None) -> jax.Array:
        return sample

    def scale_noise(
        self,
        state: FlowMatchEulerDiscreteSchedulerState,
        sample: jax.Array,
        timestep: Union[float, jax.Array],
        noise: jax.Array,
    ) -> jax.Array:
        """Forward process of rectified flow: ``σ·noise + (1−σ)·sample``
        (reference `:188-237`)."""
        ts = jnp.atleast_1d(jnp.asarray(timestep, dtype=state.timesteps.dtype))
        indices = jax.vmap(lambda t: index_for_timestep(state.timesteps, t))(ts)
        sigma = broadcast_to_left(state.sigmas[indices].astype(sample.dtype), sample.ndim)
        return sigma * noise + (1.0 - sigma) * sample

    def step(
        self,
        state: FlowMatchEulerDiscreteSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        key: Optional[jax.Array] = None,
        per_token_timesteps: Optional[jax.Array] = None,
        return_dict: bool = True,
    ):
        sample_f = sample.astype(jnp.float32)
        model_output_f = model_output.astype(jnp.float32)

        if per_token_timesteps is not None:
            # Per-token Euler step (reference scheduling_flow_match_euler_discrete
            # .py:486-496): each token steps from its own sigma down to the
            # largest grid sigma strictly below it (0 if none) — the LTX
            # condition pipelines pin conditioning tokens at sigma≈0 this way.
            per_token_sigmas = (
                per_token_timesteps.astype(jnp.float32) / self.config.num_train_timesteps
            )  # [B, S]
            grid = state.sigmas.astype(jnp.float32)  # [n+1]
            lower = jnp.max(
                jnp.where(grid[:, None, None] < per_token_sigmas[None] - 1e-6,
                          grid[:, None, None], 0.0),
                axis=0,
            )  # [B, S]
            sigma = per_token_sigmas[..., None]
            sigma_next = lower[..., None]
        else:
            idx = index_for_timestep(state.timesteps, jnp.asarray(timestep, dtype=state.timesteps.dtype))
            sigma = state.sigmas[idx]
            sigma_next = state.sigmas[idx + 1]

        if self.config.stochastic_sampling:
            if key is None:
                raise ValueError("stochastic_sampling requires a PRNG key")
            x0 = sample_f - sigma * model_output_f
            noise = randn_tensor(sample.shape, key=key, dtype=jnp.float32)
            prev_sample = (1.0 - sigma_next) * x0 + sigma_next * noise
        else:
            prev_sample = sample_f + (sigma_next - sigma) * model_output_f

        prev_sample = prev_sample.astype(model_output.dtype)
        if not return_dict:
            return (prev_sample,)
        return FlowMatchEulerDiscreteSchedulerOutput(prev_sample=prev_sample, state=state)

    def __len__(self):
        return self.config.num_train_timesteps


def calculate_shift(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    """Resolution-dependent mu for dynamic time shifting (reference
    `pipelines/flux/pipeline_flux.py:825` calculate_shift)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b
