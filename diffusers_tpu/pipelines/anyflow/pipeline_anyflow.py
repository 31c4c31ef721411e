"""AnyFlow any-step text-to-video pipeline (bidirectional flow map).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/anyflow/pipeline_anyflow.py`):
per-FRAME timestep tensors fed to the dual-timestep Wan backbone, the target
timestep `r` taken from the next schedule sigma (mean-velocity mode) or set
equal to `t` (instantaneous-velocity mode), optional context-video latents
pinned at timestep 0 in a frame prefix, UMT5 prompt encoding, flow-map Euler
update `z_r = z_t − (σ_t − σ_r)·v`.

TPU-first: one scanned jit; per-step (t, r) pairs ride the scan xs.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline
from ..wan.pipeline_wan import WanPipeline

logger = logging.get_logger(__name__)


@dataclass
class AnyFlowPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class AnyFlowPipeline(DiffusionPipeline):
    _supported_cache_configs = ()

    def __init__(self, tokenizer, text_encoder, transformer, vae, scheduler):
        super().__init__()
        self.register_modules(tokenizer=tokenizer, text_encoder=text_encoder,
                              transformer=transformer, vae=vae, scheduler=scheduler)
        self.vae_scale_factor_temporal = vae[0].config.scale_factor_temporal if vae is not None else 4
        self.vae_scale_factor_spatial = vae[0].config.scale_factor_spatial if vae is not None else 8

    _get_t5_prompt_embeds = WanPipeline._get_t5_prompt_embeds
    encode_prompt = WanPipeline.encode_prompt

    def _denoise(self, t_params, latents, prompt_embeds, timesteps, r_timesteps, state,
                 video_latents, context_length, guidance_scale, do_cfg, use_mean_velocity):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, xs):
            lat, sstate = carry
            t, r = xs
            lat_in = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
            b, f = lat_in.shape[0], lat_in.shape[1]
            t_frames = jnp.broadcast_to(t, (b, f))
            r_frames = jnp.broadcast_to(r if use_mean_velocity else t, (b, f))
            if video_latents is not None:
                lat_in = lat_in.at[:, :context_length].set(
                    jnp.concatenate([video_latents] * (2 if do_cfg else 1), axis=0))
                t_frames = t_frames.at[:, :context_length].set(0.0)
            pred = transformer(t_params, lat_in, t_frames, r_frames, prompt_embeds).sample
            if do_cfg:
                uncond, cond = jnp.split(pred, 2, axis=0)
                pred = uncond + guidance_scale * (cond - uncond)
            out = scheduler.step(sstate, pred, t, lat, r_timestep=r)
            return (out.prev_sample, sstate), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (timesteps, r_timesteps))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: int = 4,
        guidance_scale: float = 1.0,
        use_mean_velocity: bool = True,
        video_latents: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        sigmas: Optional[List[float]] = None,
        max_sequence_length: int = 512,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg,
                                                            max_sequence_length)
        batch_size = prompt_embeds.shape[0]
        if do_cfg:
            prompt_embeds = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)

        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        shape = (batch_size, num_latent_frames, vae.config.z_dim, lh, lw)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)

        state = self.scheduler.set_timesteps(num_inference_steps, sigmas=sigmas)
        timesteps = state.timesteps
        # target r = next schedule sigma scaled back to train-timestep units
        r_timesteps = state.sigmas[1:] * self.scheduler.config.num_train_timesteps

        context_length = 0 if video_latents is None else int(video_latents.shape[1])
        denoise = self._jit(
            "denoise",
            partial(self._denoise, video_latents=video_latents,
                    context_length=context_length, guidance_scale=float(guidance_scale),
                    do_cfg=do_cfg, use_mean_velocity=bool(use_mean_velocity)),
            static=(context_length, float(guidance_scale), do_cfg, bool(use_mean_velocity),
                    video_latents is None),
        )
        latents = denoise(t_params, latents, prompt_embeds, timesteps, r_timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            lat = jnp.transpose(latents, (0, 2, 1, 3, 4))  # [B, C, F, H, W]
            lm = vae.config.get("latents_mean")
            ls = vae.config.get("latents_std")
            if lm is not None and ls is not None:
                mean = jnp.asarray(lm).reshape(1, -1, 1, 1, 1)
                std = jnp.asarray(ls).reshape(1, -1, 1, 1, 1)
                lat = lat * std + mean
            video = self._jit("decode", lambda p, z: vae.decode(p, z).sample)(vae_params, lat)
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video,)
        return AnyFlowPipelineOutput(frames=video)
