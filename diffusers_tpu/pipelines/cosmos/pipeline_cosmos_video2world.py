"""Cosmos-Predict1 video2world (image/video-conditioned video) pipeline.

Behavioral mirror of the reference
`pipelines/cosmos/pipeline_cosmos_video2world.py:178` (CosmosVideoToWorldPipeline):
EDM Euler over karras sigmas; the conditioning frames are re-noised at
`augment_sigma` each step, rescaled by c_in(augment)/c_in(sigma), pinned via
a frame indicator (dropped entirely once sigma <= augment_sigma), run with a
condition-mask channel, and the x0 estimates are re-pinned before CFG
extrapolation. ONE lax.scan with per-step noise keys.

The Cosmos guardrail safety checker is a separately-licensed external
package in the reference and is not replicated.
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
from ...video_processor import VideoProcessor
from ..pipeline_utils import DiffusionPipeline
from .pipeline_cosmos_text2world import CosmosPipelineOutput, CosmosTextToWorldPipeline

logger = logging.get_logger(__name__)


class CosmosVideoToWorldPipeline(DiffusionPipeline):
    def __init__(self, text_encoder, tokenizer, transformer, vae, scheduler):
        super().__init__()
        self.register_modules(
            text_encoder=text_encoder, tokenizer=tokenizer, transformer=transformer,
            vae=vae, scheduler=scheduler,
        )
        vae_cfg = self.vae[0].config if vae is not None else None
        self.vae_scale_factor_temporal = getattr(vae_cfg, "temporal_compression_ratio", 8) if vae_cfg else 8
        if vae_cfg is None:
            self.vae_scale_factor_spatial = 8
        elif getattr(vae_cfg, "spatial_compression_ratio", None) is not None:
            self.vae_scale_factor_spatial = vae_cfg.spatial_compression_ratio
        else:
            self.vae_scale_factor_spatial = 2 ** (len(vae_cfg.block_out_channels) - 1)
        self.video_processor = VideoProcessor(vae_scale_factor=self.vae_scale_factor_spatial)

    _get_t5_prompt_embeds = CosmosTextToWorldPipeline._get_t5_prompt_embeds
    encode_prompt = CosmosTextToWorldPipeline.encode_prompt

    def prepare_latents(self, video, batch, num_channels, height, width, num_frames,
                        num_cond_frames, key, init_noise_sigma):
        vae, vae_params = self.vae
        f_in = video.shape[2]
        if f_in >= num_frames:
            video = video[:, :, -num_frames:]
        else:
            pad = jnp.repeat(video[:, :, -1:], num_frames - f_in, axis=2)
            video = jnp.concatenate([video, pad], axis=2)
        num_cond_latent_frames = (num_cond_frames - 1) // self.vae_scale_factor_temporal + 1

        def encode(p, v, k):
            dist = vae.encode(p, v)
            dist = dist.latent_dist if hasattr(dist, "latent_dist") else dist
            return dist.sample(k) if hasattr(dist, "sample") else dist

        key, enc_key, lat_key = jax.random.split(key, 3)
        init_latents = self._jit("encode_vae", encode)(vae_params, video, enc_key)
        # Predict1 normalization: per-channel latents_mean/std scaled by
        # sigma_data when present (mirrors the t2w decode path, reversed)
        cfg = vae.config
        sigma_data = getattr(self.scheduler.config, "sigma_data", 0.5)
        if getattr(cfg, "latents_mean", None) is not None:
            zc = cfg.latent_channels
            mean = jnp.asarray(cfg.latents_mean).reshape(1, zc, -1, 1, 1)[:, :, : init_latents.shape[2]]
            std = jnp.asarray(cfg.latents_std).reshape(1, zc, -1, 1, 1)[:, :, : init_latents.shape[2]]
            init_latents = (init_latents - mean) / std * sigma_data
        else:
            init_latents = init_latents * sigma_data

        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lh, lw = height // self.vae_scale_factor_spatial, width // self.vae_scale_factor_spatial
        latents = randn_tensor((batch, num_channels, num_latent_frames, lh, lw), key=lat_key)
        latents = latents * init_noise_sigma

        indicator = jnp.zeros((1, 1, num_latent_frames, 1, 1), jnp.float32)
        indicator = indicator.at[:, :, :num_cond_latent_frames].set(1.0)
        cond_mask = jnp.broadcast_to(indicator, (batch, 1, num_latent_frames, lh, lw))
        return latents, init_latents, indicator, cond_mask

    def _denoise(self, tr_params, latents, cond_latents, indicator, cond_mask,
                 prompt_embeds, negative_embeds, state, padding_mask, step_keys,
                 augment_sigma, guidance_scale, do_cfg, fps):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        sigmas, timesteps = state.sigmas, state.timesteps
        sigma_data = scheduler.config.sigma_data

        def c_in(sigma):
            return 1.0 / jnp.sqrt(sigma**2 + sigma_data**2)

        def step_fn(latents, xs):
            idx, noise_key = xs
            sigma = sigmas[idx]
            sigma_next = sigmas[idx + 1]
            t = jnp.broadcast_to(timesteps[idx], (latents.shape[0],))
            cur_ind = jnp.where(augment_sigma >= sigma, jnp.zeros_like(indicator), indicator)

            noise = randn_tensor(latents.shape, key=noise_key)
            aug_latent = (cond_latents + noise * augment_sigma) * c_in(augment_sigma) / c_in(sigma)

            def branch(embeds):
                blended = cur_ind * aug_latent + (1 - cur_ind) * latents
                latent_in = scheduler.precondition_inputs(blended, sigma)
                pred = transformer(
                    tr_params, latent_in, timestep=t, encoder_hidden_states=embeds,
                    fps=fps, condition_mask=cond_mask, padding_mask=padding_mask,
                ).sample
                x0 = scheduler.precondition_outputs(blended, pred.astype(jnp.float32), sigma)
                return cur_ind * cond_latents + (1 - cur_ind) * x0

            x0 = branch(prompt_embeds)
            if do_cfg:
                x0_u = branch(negative_embeds)
                x0 = x0 + guidance_scale * (x0 - x0_u)
            derivative = (latents - x0) / sigma
            return latents + derivative * (sigma_next - sigma), None

        latents, _ = jax.lax.scan(
            step_fn, latents.astype(jnp.float32),
            (jnp.arange(timesteps.shape[0]), step_keys),
        )
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        image=None,  # [B, C, H, W] in [-1, 1]
        video=None,  # [B, C, F, H, W] in [-1, 1]
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 704,
        width: int = 1280,
        num_frames: int = 121,
        num_inference_steps: int = 36,
        guidance_scale: float = 7.0,
        fps: int = 30,
        augment_sigma: float = 0.001,
        key: Optional[jax.Array] = None,
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

        state = self.scheduler.set_timesteps(num_inference_steps)

        key, prep_key, scan_key = jax.random.split(key, 3)
        latents, cond_latents, indicator, cond_mask = self.prepare_latents(
            video, batch, transformer.config.in_channels - 1, height, width, num_frames,
            num_cond_frames, prep_key, float(state.sigmas[0]),
        )
        padding_mask = jnp.zeros((1, 1, height, width), jnp.float32)
        step_keys = jax.random.split(scan_key, num_inference_steps)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, augment_sigma=augment_sigma, guidance_scale=guidance_scale,
                    do_cfg=do_cfg, fps=fps),
            static=(augment_sigma, guidance_scale, do_cfg, fps),
        )
        latents = denoise(tr_params, latents, cond_latents, indicator, cond_mask,
                          prompt_embeds, negative_embeds, state, padding_mask, step_keys)

        if output_type == "latent":
            video_out = latents
        else:
            cfg = vae.config
            sigma_data = getattr(self.scheduler.config, "sigma_data", 0.5)

            def decode(p, z):
                if getattr(cfg, "latents_mean", None) is not None:
                    zc = cfg.latent_channels
                    mean = jnp.asarray(cfg.latents_mean).reshape(1, zc, -1, 1, 1)[:, :, : z.shape[2]]
                    std = jnp.asarray(cfg.latents_std).reshape(1, zc, -1, 1, 1)[:, :, : z.shape[2]]
                    z = z * std / sigma_data + mean
                else:
                    z = z / sigma_data
                return vae.decode(p, z).sample

            video_out = self._jit("decode", decode)(vae_params, latents)
            video_out = self.video_processor.postprocess_video(video_out, output_type=output_type)

        if not return_dict:
            return (video_out,)
        return CosmosPipelineOutput(frames=video_out)
