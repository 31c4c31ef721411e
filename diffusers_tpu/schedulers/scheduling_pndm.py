"""PNDM (PLMS) sampler — functional TPU-native implementation.

Numerics follow the reference `scheduling_pndm.py`
(`/root/reference/src/diffusers/schedulers/scheduling_pndm.py`): the
`skip_prk_steps=True` PLMS path used by every shipped Stable Diffusion
config (step_plms `:254-330`, _get_prev_sample formula (9) of
https://huggingface.co/papers/2202.09778 at `:358-400`).

Functional multistep design: the ets history ([4, *shape]), its fill count,
the step counter, and the `cur_sample` buffer live in the state pytree;
warm-up-order selection is a `lax.switch` over the history length.
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
from .scheduling_utils import (
    KarrasDiffusionSchedulers,
    SchedulerMixin,
    broadcast_to_left,
    make_beta_schedule,
)


@flax.struct.dataclass
class PNDMSchedulerState:
    timesteps: jax.Array  # int32 [S]
    alphas_cumprod: jax.Array
    final_alpha_cumprod: jax.Array
    counter: jax.Array  # int32 scalar
    ets: Optional[jax.Array]  # [4, *shape]
    ets_count: jax.Array  # int32 scalar
    cur_sample: Optional[jax.Array]
    init_noise_sigma: float = flax.struct.field(pytree_node=False, default=1.0)
    num_inference_steps: Optional[int] = flax.struct.field(pytree_node=False, default=None)


@dataclass
class PNDMSchedulerOutput(BaseOutput):
    prev_sample: jax.Array
    state: Optional[PNDMSchedulerState] = None


class PNDMScheduler(SchedulerMixin, ConfigMixin):
    _compatibles = [e.name for e in KarrasDiffusionSchedulers]
    order = 1

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        trained_betas: Optional[List[float]] = None,
        skip_prk_steps: bool = False,
        set_alpha_to_one: bool = False,
        prediction_type: str = "epsilon",
        timestep_spacing: str = "leading",
        steps_offset: int = 0,
    ):
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end, trained_betas)
        self.betas = betas
        self.alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(self.alphas, axis=0)
        self.final_alpha_cumprod = np.float32(1.0) if set_alpha_to_one else self.alphas_cumprod[0]
        self.init_noise_sigma = 1.0
        self.pndm_order = 4

    def set_timesteps(self, num_inference_steps: int, sample_shape: Optional[tuple] = None) -> PNDMSchedulerState:
        if not self.config.skip_prk_steps:
            raise NotImplementedError(
                "PRK warm-up steps are not implemented (every shipped SD config sets skip_prk_steps=True)."
            )
        if self.config.timestep_spacing == "linspace":
            _timesteps = np.linspace(0, self.config.num_train_timesteps - 1, num_inference_steps).round().astype(np.int64)
        elif self.config.timestep_spacing == "leading":
            step_ratio = self.config.num_train_timesteps // num_inference_steps
            _timesteps = (np.arange(0, num_inference_steps) * step_ratio).round().astype(np.int64)
            _timesteps += self.config.steps_offset
        elif self.config.timestep_spacing == "trailing":
            step_ratio = self.config.num_train_timesteps / num_inference_steps
            _timesteps = np.round(np.arange(self.config.num_train_timesteps, 0, -step_ratio))[::-1].astype(np.int64)
            _timesteps -= 1
        else:
            raise ValueError(f"unsupported timestep_spacing {self.config.timestep_spacing}")

        # skip_prk_steps=True: repeat the second-to-last timestep once
        plms_timesteps = np.concatenate([_timesteps[:-1], _timesteps[-2:-1], _timesteps[-1:]])[::-1].copy()

        ets = None
        cur_sample = None
        if sample_shape is not None:
            ets = jnp.zeros((4, *sample_shape), dtype=jnp.float32)
            cur_sample = jnp.zeros(sample_shape, dtype=jnp.float32)

        return PNDMSchedulerState(
            timesteps=jnp.asarray(plms_timesteps, dtype=jnp.int32),
            alphas_cumprod=jnp.asarray(self.alphas_cumprod, dtype=jnp.float32),
            final_alpha_cumprod=jnp.asarray(self.final_alpha_cumprod, dtype=jnp.float32),
            counter=jnp.asarray(0, dtype=jnp.int32),
            ets=ets,
            ets_count=jnp.asarray(0, dtype=jnp.int32),
            cur_sample=cur_sample,
            num_inference_steps=num_inference_steps,
        )

    def prepare(self, state: PNDMSchedulerState, sample: jax.Array) -> PNDMSchedulerState:
        if state.ets is not None:
            return state
        return state.replace(
            ets=jnp.zeros((4, *sample.shape), dtype=jnp.float32),
            cur_sample=jnp.zeros(sample.shape, dtype=jnp.float32),
        )

    def scale_model_input(self, state, sample, timestep=None):
        return sample

    def _get_prev_sample(self, state, sample, timestep, prev_timestep, model_output):
        alpha_prod_t = state.alphas_cumprod[timestep]
        alpha_prod_t_prev = jnp.where(
            prev_timestep >= 0, state.alphas_cumprod[jnp.clip(prev_timestep, 0)], state.final_alpha_cumprod
        )
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev

        if self.config.prediction_type == "v_prediction":
            model_output = (alpha_prod_t**0.5) * model_output + (beta_prod_t**0.5) * sample
        elif self.config.prediction_type != "epsilon":
            raise ValueError(f"prediction_type must be epsilon or v_prediction, got {self.config.prediction_type}")

        sample_coeff = (alpha_prod_t_prev / alpha_prod_t) ** 0.5
        denom = alpha_prod_t * beta_prod_t_prev**0.5 + (alpha_prod_t * beta_prod_t * alpha_prod_t_prev) ** 0.5
        return sample_coeff * sample - (alpha_prod_t_prev - alpha_prod_t) * model_output / denom

    def step(
        self,
        state: PNDMSchedulerState,
        model_output: jax.Array,
        timestep,
        sample: jax.Array,
        return_dict: bool = True,
    ):
        state = self.prepare(state, sample)
        t = jnp.asarray(timestep, dtype=jnp.int32)
        step_ratio = self.config.num_train_timesteps // state.num_inference_steps
        counter = state.counter

        model_output_f = model_output.astype(jnp.float32)
        sample_f = sample.astype(jnp.float32)

        prev_t = t - step_ratio
        # counter == 1: re-use timestep pair (t, t+ratio) and the buffered sample
        t_eff = jnp.where(counter == 1, t + step_ratio, t)
        prev_t = jnp.where(counter == 1, t, prev_t)

        # history update (skipped at counter == 1)
        new_ets = jnp.where(
            counter != 1,
            jnp.concatenate([state.ets[1:], model_output_f[None]], axis=0),
            state.ets,
        )
        new_ets_count = jnp.where(counter != 1, jnp.minimum(state.ets_count + 1, 4), state.ets_count)

        e1 = new_ets[-1]
        e2 = new_ets[-2]
        e3 = new_ets[-3]
        e4 = new_ets[-4]

        # order-dependent combination; traced switch over history length
        mo_order1_c0 = model_output_f  # ets_count==1, counter==0
        mo_order1_c1 = (model_output_f + e1) / 2  # ets_count==1, counter==1
        mo_order2 = (3 * e1 - e2) / 2
        mo_order3 = (23 * e1 - 16 * e2 + 5 * e3) / 12
        mo_order4 = (55 * e1 - 59 * e2 + 37 * e3 - 9 * e4) / 24

        combined = jnp.where(
            new_ets_count == 1,
            jnp.where(counter == 0, mo_order1_c0, mo_order1_c1),
            jnp.where(new_ets_count == 2, mo_order2, jnp.where(new_ets_count == 3, mo_order3, mo_order4)),
        )

        # sample source: buffered cur_sample when counter == 1
        new_cur_sample = jnp.where(counter == 0, sample_f, state.cur_sample)
        sample_used = jnp.where(counter == 1, state.cur_sample, sample_f)

        prev_sample = self._get_prev_sample(state, sample_used, t_eff, prev_t, combined)
        prev_sample = prev_sample.astype(model_output.dtype)

        new_state = state.replace(
            counter=counter + 1,
            ets=new_ets,
            ets_count=new_ets_count,
            cur_sample=new_cur_sample,
        )
        if not return_dict:
            return (prev_sample, new_state)
        return PNDMSchedulerOutput(prev_sample=prev_sample, state=new_state)

    def add_noise(self, state, original_samples, noise, timesteps):
        acp = state.alphas_cumprod.astype(original_samples.dtype)
        a = broadcast_to_left(acp[timesteps] ** 0.5, original_samples.ndim)
        b = broadcast_to_left((1 - acp[timesteps]) ** 0.5, original_samples.ndim)
        return a * original_samples + b * noise

    def __len__(self):
        return self.config.num_train_timesteps
