"""Cosmos-Predict2 text-to-image pipeline.

Behavioral mirror of the reference
`pipelines/cosmos/pipeline_cosmos2_text2image.py:160` (Cosmos2TextToImagePipeline):
T5 conditioning, flow-match sigmas linspace(0,1,N) with the final zero sigma
optionally replaced by sigma_min, Cosmos2 preconditioning per step
(t = sigma/(1+sigma); c_in = c_skip = 1-t, c_out = -t), CFG extrapolation on
the x0 estimates, velocity = (latents - x0)/sigma into the flow-match Euler
step, Wan-VAE decode with latents_mean/std/sigma_data denormalization. The
loop is ONE lax.scan over sigma indices.

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
class CosmosImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class Cosmos2TextToImagePipeline(DiffusionPipeline):
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

    # same masked-T5 encode as Predict1 (reference encode_prompt is `# Copied from`)
    _get_t5_prompt_embeds = CosmosTextToWorldPipeline._get_t5_prompt_embeds
    encode_prompt = CosmosTextToWorldPipeline.encode_prompt

    def _denoise(self, tr_params, latents, prompt_embeds, negative_embeds, state, padding_mask,
                 guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        sigmas, timesteps = state.sigmas, state.timesteps

        def step_fn(latents, idx):
            sigma = sigmas[idx]
            t = sigma / (sigma + 1.0)
            c_in = 1.0 - t
            c_skip = 1.0 - t
            c_out = -t
            timestep = jnp.broadcast_to(t, (latents.shape[0],))
            latent_in = (latents * c_in).astype(jnp.float32)

            pred = transformer(
                tr_params, latent_in, timestep, prompt_embeds, padding_mask=padding_mask,
            ).sample.astype(jnp.float32)
            x0 = c_skip * latents + c_out * pred
            if do_cfg:
                pred_u = transformer(
                    tr_params, latent_in, timestep, negative_embeds, padding_mask=padding_mask,
                ).sample.astype(jnp.float32)
                x0_u = c_skip * latents + c_out * pred_u
                x0 = x0 + guidance_scale * (x0 - x0_u)
            velocity = (latents - x0) / jnp.maximum(sigma, 1e-12)
            out = scheduler.step(state, velocity, timesteps[idx], latents)
            return out.prev_sample, None

        latents, _ = jax.lax.scan(step_fn, latents, jnp.arange(timesteps.shape[0]))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 768,
        width: int = 1360,
        num_inference_steps: int = 35,
        guidance_scale: float = 7.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
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

        sigmas = np.linspace(0.0, 1.0, num_inference_steps)
        state = self.scheduler.set_timesteps(sigmas=list(sigmas))
        if self.scheduler.config.get("final_sigmas_type", "zero") == "sigma_min":
            new_sigmas = state.sigmas.at[-1].set(state.sigmas[-2])
            state = dataclasses.replace(state, sigmas=new_sigmas)

        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        if latents is None:
            latents = randn_tensor((batch, transformer.config.in_channels, 1, lh, lw), key=key)
        latents = latents * float(state.sigmas[0])
        padding_mask = jnp.zeros((1, 1, height, width), jnp.float32)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg),
        )
        latents = denoise(tr_params, latents, prompt_embeds, negative_embeds, state, padding_mask)

        if output_type == "latent":
            image = latents[:, :, 0]
        else:
            z_dim = vae.config.z_dim
            mean = jnp.asarray(vae.config.latents_mean).reshape(1, z_dim, 1, 1, 1)
            std = jnp.asarray(vae.config.latents_std).reshape(1, z_dim, 1, 1, 1)
            sigma_data = getattr(self.scheduler.config, "sigma_data", 1.0) or 1.0

            def decode(p, z):
                z = z * std / sigma_data + mean
                return vae.decode(p, z).sample

            video = self._jit("decode", decode)(vae_params, latents)
            video = self.video_processor.postprocess_video(video, output_type=output_type)
            image = np.stack([v[0] for v in video]) if output_type == "np" else [v[0] for v in video]

        if not return_dict:
            return (image,)
        return CosmosImagePipelineOutput(images=image)
