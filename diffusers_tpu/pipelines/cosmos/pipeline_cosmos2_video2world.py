"""Cosmos-Predict2 video2world (image/video-conditioned video) pipeline.

Behavioral mirror of the reference
`pipelines/cosmos/pipeline_cosmos2_video2world.py:170`
(Cosmos2VideoToWorldPipeline): the conditioning image/video VAE-encodes to
normalized init latents pinned over the first latent frames via a frame
indicator; conditioned frames run at t_conditioning = sigma_cond/(1+sigma_cond)
through PER-FRAME timesteps [B,1,T,1,1] and a condition mask channel; both
the input and the x0 estimate are re-pinned to the conditioning latents each
step. CFG extrapolates the pinned x0 estimates. ONE lax.scan over sigmas.

The Cosmos guardrail safety checker is a separately-licensed external
package in the reference and is not replicated.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ...video_processor import VideoProcessor
from ..pipeline_utils import DiffusionPipeline
from .pipeline_cosmos_text2world import CosmosTextToWorldPipeline

logger = logging.get_logger(__name__)


@dataclass
class CosmosVideoPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class Cosmos2VideoToWorldPipeline(DiffusionPipeline):
    def __init__(self, text_encoder, tokenizer, transformer, vae, scheduler):
        super().__init__()
        self.register_modules(
            text_encoder=text_encoder, tokenizer=tokenizer, transformer=transformer,
            vae=vae, scheduler=scheduler,
        )
        vae_cfg = self.vae[0].config if vae is not None else None
        self.vae_scale_factor_temporal = getattr(vae_cfg, "scale_factor_temporal", 4) if vae_cfg else 4
        self.vae_scale_factor_spatial = getattr(vae_cfg, "scale_factor_spatial", 8) if vae_cfg else 8
        self.video_processor = VideoProcessor(vae_scale_factor=self.vae_scale_factor_spatial)

    _get_t5_prompt_embeds = CosmosTextToWorldPipeline._get_t5_prompt_embeds
    encode_prompt = CosmosTextToWorldPipeline.encode_prompt

    def prepare_latents(self, video, batch, num_channels, height, width, num_frames,
                        num_cond_frames, key, sigma_max, sigma_data):
        """video: [B, C, F_in, H, W] in [-1, 1]; pads/truncates to num_frames
        and VAE-encodes to normalized conditioning latents (reference
        `prepare_latents`, `:356`)."""
        vae, vae_params = self.vae
        f_in = video.shape[2]
        if f_in >= num_frames:
            video = video[:, :, -num_frames:]
            num_cond_latent_frames = (num_cond_frames - 1) // self.vae_scale_factor_temporal + 1
        else:
            num_cond_latent_frames = (num_cond_frames - 1) // self.vae_scale_factor_temporal + 1
            pad = jnp.repeat(video[:, :, -1:], num_frames - f_in, axis=2)
            video = jnp.concatenate([video, pad], axis=2)

        def encode(p, v, k):
            dist = vae.encode(p, v)
            dist = dist.latent_dist if hasattr(dist, "latent_dist") else dist
            return dist.sample(k) if hasattr(dist, "sample") else dist

        key, enc_key = jax.random.split(key)
        init_latents = self._jit("encode_vae", encode)(vae_params, video, enc_key)
        z_dim = vae.config.z_dim
        mean = jnp.asarray(vae.config.latents_mean).reshape(1, z_dim, 1, 1, 1)
        std = jnp.asarray(vae.config.latents_std).reshape(1, z_dim, 1, 1, 1)
        init_latents = (init_latents - mean) / std * sigma_data

        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lh, lw = height // self.vae_scale_factor_spatial, width // self.vae_scale_factor_spatial
        key, lat_key = jax.random.split(key)
        latents = randn_tensor((batch, num_channels, num_latent_frames, lh, lw), key=lat_key)
        latents = latents * sigma_max

        indicator = jnp.zeros((1, 1, num_latent_frames, 1, 1), jnp.float32)
        indicator = indicator.at[:, :, :num_cond_latent_frames].set(1.0)
        cond_mask = jnp.broadcast_to(indicator, (batch, 1, num_latent_frames, lh, lw))
        return latents, init_latents, indicator, cond_mask

    def _denoise(self, tr_params, latents, cond_latents, indicator, cond_mask,
                 prompt_embeds, negative_embeds, state, padding_mask, fps,
                 t_conditioning, guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        sigmas, timesteps = state.sigmas, state.timesteps

        def branch(latents, sigma, embeds):
            t = sigma / (sigma + 1.0)
            c_in, c_skip, c_out = 1.0 - t, 1.0 - t, -t
            timestep = jnp.broadcast_to(t, (latents.shape[0], 1, latents.shape[2], 1, 1))
            latent_in = indicator * cond_latents + (1 - indicator) * (latents * c_in)
            cond_timestep = indicator * t_conditioning + (1 - indicator) * timestep
            pred = transformer(
                tr_params, latent_in.astype(jnp.float32), cond_timestep, embeds,
                fps=fps, condition_mask=cond_mask, padding_mask=padding_mask,
            ).sample.astype(jnp.float32)
            x0 = c_skip * latents + c_out * pred
            return indicator * cond_latents + (1 - indicator) * x0

        def step_fn(latents, idx):
            sigma = sigmas[idx]
            x0 = branch(latents, sigma, prompt_embeds)
            if do_cfg:
                x0_u = branch(latents, sigma, negative_embeds)
                x0 = x0 + guidance_scale * (x0 - x0_u)
            velocity = (latents - x0) / jnp.maximum(sigma, 1e-12)
            out = scheduler.step(state, velocity, timesteps[idx], latents)
            return out.prev_sample, None

        latents, _ = jax.lax.scan(step_fn, latents, jnp.arange(timesteps.shape[0]))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        image=None,  # [B, C, H, W] in [-1, 1]
        video=None,  # [B, C, F, H, W] in [-1, 1]
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 704,
        width: int = 1280,
        num_frames: int = 93,
        num_inference_steps: int = 35,
        guidance_scale: float = 7.0,
        fps: int = 16,
        key: Optional[jax.Array] = None,
        sigma_conditioning: float = 0.0001,
        max_sequence_length: int = 512,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, tr_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0

        prompt_embeds, negative_embeds = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length
        )
        batch = prompt_embeds.shape[0]

        if image is not None:
            video = jnp.asarray(image)[:, :, None]
            num_cond_frames = 1
        else:
            video = jnp.asarray(video)
            num_cond_frames = video.shape[2]

        sigmas = np.linspace(0.0, 1.0, num_inference_steps)
        state = self.scheduler.set_timesteps(sigmas=list(sigmas))
        if self.scheduler.config.get("final_sigmas_type", "zero") == "sigma_min":
            state = dataclasses.replace(state, sigmas=state.sigmas.at[-1].set(state.sigmas[-2]))
        sigma_data = getattr(self.scheduler.config, "sigma_data", 1.0) or 1.0

        latents, cond_latents, indicator, cond_mask = self.prepare_latents(
            video, batch, transformer.config.in_channels - 1, height, width, num_frames,
            num_cond_frames, key, float(state.sigmas[0]), sigma_data,
        )
        padding_mask = jnp.zeros((1, 1, height, width), jnp.float32)
        t_conditioning = sigma_conditioning / (sigma_conditioning + 1.0)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg,
                    t_conditioning=t_conditioning, fps=fps),
            static=(guidance_scale, do_cfg, t_conditioning, fps),
        )
        latents = denoise(tr_params, latents, cond_latents, indicator, cond_mask,
                          prompt_embeds, negative_embeds, state, padding_mask)

        if output_type == "latent":
            video_out = latents
        else:
            z_dim = vae.config.z_dim
            mean = jnp.asarray(vae.config.latents_mean).reshape(1, z_dim, 1, 1, 1)
            std = jnp.asarray(vae.config.latents_std).reshape(1, z_dim, 1, 1, 1)

            def decode(p, z):
                z = z * std / sigma_data + mean
                return vae.decode(p, z).sample

            video_out = self._jit("decode", decode)(vae_params, latents)
            video_out = self.video_processor.postprocess_video(video_out, output_type=output_type)

        if not return_dict:
            return (video_out,)
        return CosmosVideoPipelineOutput(frames=video_out)
