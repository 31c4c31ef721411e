"""HeliosScheduler — staged flow UniPC/Euler sampler for the Helios world model.

Numerics follow the reference
(`/root/reference/src/diffusers/schedulers/scheduling_helios.py:35`
HeliosScheduler): shifted flow sigma ladder (`init_sigmas` `:90`), per-stage
pyramid tables with the gamma-corrected stage start sigma (`:108`), dynamic
exponential/linear time shift, `flow_prediction` x0 conversion with the raw
step sigma (`:371`), bh1/bh2 UniPC predictor-corrector or plain flow Euler
(`:311`), optional DMD timestep trimming in `set_timesteps` (`:205`).

TPU-first: the stage tables are host numpy computed once at construction;
the UniPC multistep machinery (converted-output history, last_sample,
step_index) is reused from our functional `UniPCMultistepScheduler`, so the
whole step is scan-friendly pure gathers + FMAs.
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..configuration_utils import register_to_config
from .scheduling_unipc_multistep import (
    UniPCMultistepScheduler,
    UniPCMultistepSchedulerOutput,
    UniPCMultistepSchedulerState,
)

HeliosSchedulerOutput = UniPCMultistepSchedulerOutput
HeliosSchedulerState = UniPCMultistepSchedulerState


class HeliosScheduler(UniPCMultistepScheduler):
    order = 1

    @register_to_config
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        shift: float = 1.0,
        stages: int = 3,
        stage_range: List[float] = [0, 1 / 3, 2 / 3, 1],
        gamma: float = 1 / 3,
        thresholding: bool = False,
        prediction_type: str = "flow_prediction",
        solver_order: int = 2,
        predict_x0: bool = True,
        solver_type: str = "bh2",
        lower_order_final: bool = True,
        disable_corrector: List[int] = [],
        solver_p=None,
        use_flow_sigmas: bool = True,
        scheduler_type: str = "unipc",  # ["euler", "unipc", "dmd"]
        use_dynamic_shifting: bool = False,
        time_shift_type: str = "exponential",
    ):
        if solver_type not in ("bh1", "bh2"):
            self.register_to_config(solver_type="bh2")
        self._init_stage_tables()

    # ------------------------------------------------------------------ tables
    def _global_sigmas(self):
        """Shifted flow ladder over the full training range (reference `:90`)."""
        T = self.config.num_train_timesteps
        alphas = np.linspace(1, 1 / T, T + 1)
        sigmas = 1.0 - alphas
        sigmas = np.flip(self.config.shift * sigmas / (1 + (self.config.shift - 1) * sigmas))[:-1].copy()
        return sigmas, sigmas * T

    def _init_stage_tables(self):
        """Per-stage timestep/sigma tables (reference `:108`)."""
        sigmas, timesteps = self._global_sigmas()
        self.sigmas_global = sigmas
        self.timesteps_global = timesteps
        T = self.config.num_train_timesteps
        stages = self.config.stages
        stage_range = self.config.stage_range

        start_sigmas, end_sigmas, ori_start_sigmas, stage_distance = {}, {}, {}, []
        for i_s in range(stages):
            start_indice = max(int(stage_range[i_s] * T), 0)
            end_indice = min(int(stage_range[i_s + 1] * T), T)
            start_sigma = float(sigmas[start_indice])
            end_sigma = float(sigmas[end_indice]) if end_indice < T else 0.0
            ori_start_sigmas[i_s] = start_sigma
            if i_s != 0:
                ori_sigma = 1 - start_sigma
                g = self.config.gamma
                corrected = (1 / (math.sqrt(1 + (1 / g)) * (1 - ori_sigma) + ori_sigma)) * ori_sigma
                start_sigma = 1 - corrected
            stage_distance.append(start_sigma - end_sigma)
            start_sigmas[i_s] = start_sigma
            end_sigmas[i_s] = end_sigma

        tot = sum(stage_distance)
        self.start_sigmas, self.end_sigmas, self.ori_start_sigmas = start_sigmas, end_sigmas, ori_start_sigmas
        self.timestep_ratios, self.timesteps_per_stage, self.sigmas_per_stage = {}, {}, {}
        for i_s in range(stages):
            start_ratio = 0.0 if i_s == 0 else sum(stage_distance[:i_s]) / tot
            end_ratio = 0.9999999999999999 if i_s == stages - 1 else sum(stage_distance[: i_s + 1]) / tot
            self.timestep_ratios[i_s] = (start_ratio, end_ratio)
            timestep_max = min(timesteps[int(start_ratio * T)], 999)
            timestep_min = timesteps[min(int(end_ratio * T), T - 1)]
            self.timesteps_per_stage[i_s] = np.linspace(timestep_max, timestep_min, T + 1)[:-1]
            self.sigmas_per_stage[i_s] = np.linspace(0.999, 0, T + 1)[:-1]

    def time_shift(self, mu, sigma, t):
        with np.errstate(divide="ignore"):
            if self.config.time_shift_type == "exponential":
                return math.exp(mu) / (math.exp(mu) + (1 / t - 1) ** sigma)
            return mu / (mu + (1 / t - 1) ** sigma)

    # ------------------------------------------------------------------ state
    def set_timesteps(
        self,
        num_inference_steps: int,
        stage_index: Optional[int] = None,
        sigmas: Optional[np.ndarray] = None,
        mu: Optional[float] = None,
        is_amplify_first_chunk: bool = False,
        sample_shape: Optional[tuple] = None,
    ) -> UniPCMultistepSchedulerState:
        T = self.config.num_train_timesteps
        is_dmd = self.config.scheduler_type == "dmd"
        if is_dmd:
            num_inference_steps = num_inference_steps * 2 + 1 if is_amplify_first_chunk else num_inference_steps + 1

        if self.config.stages == 1:
            if sigmas is None:
                sigmas = np.linspace(1, 1 / T, num_inference_steps + 1)[:-1].astype(np.float32)
                if self.config.shift != 1.0:
                    sigmas = self.time_shift(self.config.shift, 1.0, sigmas)
            sigmas = np.asarray(sigmas, np.float64)
            timesteps = (sigmas * T).copy()
        else:
            st = self.timesteps_per_stage[stage_index]
            timesteps = np.linspace(float(st[0]), float(st[-1]), num_inference_steps)
            ss = self.sigmas_per_stage[stage_index]
            sigmas = np.linspace(float(ss[0]), float(ss[-1]), num_inference_steps)

        sigmas = np.concatenate([np.asarray(sigmas, np.float64), [0.0]])
        timesteps = np.asarray(timesteps, np.float64)

        if is_dmd:
            timesteps = timesteps[:-1]
            sigmas = np.concatenate([sigmas[:-2], sigmas[-1:]])

        if self.config.use_dynamic_shifting:
            sigmas = self.time_shift(mu, 1.0, sigmas)
            if self.config.stages == 1:
                timesteps = sigmas[:-1] * T
            else:
                st = self.timesteps_per_stage[stage_index]
                timesteps = st.min() + sigmas[:-1] * (st.max() - st.min())

        model_outputs = None
        last_sample = None
        if sample_shape is not None:
            model_outputs = jnp.zeros((max(self.config.solver_order, 2), *sample_shape), jnp.float32)
            last_sample = jnp.zeros(sample_shape, jnp.float32)
        return UniPCMultistepSchedulerState(
            timesteps=jnp.asarray(timesteps, jnp.float32),
            sigmas=jnp.asarray(sigmas, jnp.float32),
            alphas_cumprod=jnp.ones((1,), jnp.float32),
            step_index=jnp.asarray(0, jnp.int32),
            model_outputs=model_outputs,
            last_sample=last_sample,
            num_inference_steps=len(timesteps),
        )

    # ------------------------------------------------------------------ math
    def _sigma_to_alpha_sigma_t(self, sigma):
        # reference `:361`: flow sigmas with a 1e-8 clamp on sigma_t
        if self.config.use_flow_sigmas:
            return 1 - sigma, jnp.maximum(sigma, 1e-8)
        alpha_t = 1 / ((sigma**2 + 1) ** 0.5)
        return alpha_t, sigma * alpha_t

    def step_euler(self, state, model_output, timestep, sample, return_dict: bool = True):
        idx = state.step_index
        sigma = state.sigmas[idx]
        sigma_next = state.sigmas[idx + 1]
        prev = (sample.astype(jnp.float32) + (sigma_next - sigma) * model_output.astype(jnp.float32))
        prev = prev.astype(model_output.dtype)
        new_state = state.replace(step_index=idx + 1)
        if not return_dict:
            return (prev, new_state)
        return UniPCMultistepSchedulerOutput(prev_sample=prev, state=new_state)

    def step(self, state, model_output, timestep, sample, return_dict: bool = True):
        if self.config.scheduler_type == "euler":
            return self.step_euler(state, model_output, timestep, sample, return_dict=return_dict)
        return super().step(state, model_output, timestep, sample, return_dict=return_dict)
