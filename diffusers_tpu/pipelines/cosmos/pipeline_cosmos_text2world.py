"""Cosmos-Predict1 text-to-world (video) pipeline.

Behavioral mirror of the reference
`pipelines/cosmos/pipeline_cosmos_text2world.py`: T5-XXL conditioning
with post-hoc length-masked zeroing (`:233`), latents initialized at
sigma_max scale (`:349`), and the EDM Euler denoise loop that applies
classifier-free guidance in x0 space — both branches are preconditioned
to pred_original_sample first, CFG extrapolates the x0 estimates, and
the Euler step then uses the guided x0 directly (`:604-615`). Decode
de-normalizes with the VAE's per-frame latents_mean/std scaled by
sigma_data when present (`:637-651`).

The Cosmos guardrail safety checker is a separately-licensed external
package in the reference and is not replicated; the denoise loop is a
`lax.scan` over sigma indices.
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

logger = logging.get_logger(__name__)


@dataclass
class CosmosPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class CosmosTextToWorldPipeline(DiffusionPipeline):
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

    def _get_t5_prompt_embeds(self, prompt: List[str], max_sequence_length: int) -> jax.Array:
        text_encoder, te_params = self.text_encoder
        inputs = self.tokenizer(
            prompt, padding="max_length", max_length=max_sequence_length,
            truncation=True, return_tensors="np",
        )
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask)
        embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
        return embeds * mask[..., None].astype(embeds.dtype)

    def encode_prompt(self, prompt, negative_prompt, do_cfg: bool, max_sequence_length: int = 512):
        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds = self._get_t5_prompt_embeds(prompt, max_sequence_length)
        negative_embeds = None
        if do_cfg:
            negative_prompt = negative_prompt or ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            negative_embeds = self._get_t5_prompt_embeds(negative_prompt, max_sequence_length)
        return prompt_embeds, negative_embeds

    def _denoise(self, tr_params, latents, prompt_embeds, negative_embeds, state, padding_mask,
                 guidance_scale, do_cfg, fps):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        sigmas, timesteps = state.sigmas, state.timesteps

        def step_fn(latents, idx):
            sigma = sigmas[idx]
            sigma_next = sigmas[idx + 1]
            t = timesteps[idx]
            latent_in = scheduler.precondition_inputs(latents, sigma)
            tvec = jnp.broadcast_to(t, (latents.shape[0],))
            pred_cond = transformer(
                tr_params, latent_in, timestep=tvec, encoder_hidden_states=prompt_embeds,
                fps=fps, padding_mask=padding_mask,
            ).sample
            x0 = scheduler.precondition_outputs(latents, pred_cond.astype(jnp.float32), sigma)
            if do_cfg:
                pred_uncond = transformer(
                    tr_params, latent_in, timestep=tvec, encoder_hidden_states=negative_embeds,
                    fps=fps, padding_mask=padding_mask,
                ).sample
                x0_uncond = scheduler.precondition_outputs(latents, pred_uncond.astype(jnp.float32), sigma)
                x0 = x0 + guidance_scale * (x0 - x0_uncond)
            derivative = (latents - x0) / sigma
            return latents + derivative * (sigma_next - sigma), None

        latents, _ = jax.lax.scan(step_fn, latents.astype(jnp.float32),
                                  jnp.arange(timesteps.shape[0]))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 704,
        width: int = 1280,
        num_frames: int = 121,
        num_inference_steps: int = 36,
        guidance_scale: float = 7.0,
        fps: int = 30,
        num_videos_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, tr_params = self.transformer
        vae, vae_params = self.vae
        if height % 16 != 0 or width % 16 != 0:
            raise ValueError(f"`height`/`width` must be divisible by 16, got {height}x{width}")
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0

        prompt_embeds, negative_embeds = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length=max_sequence_length
        )
        batch_size = prompt_embeds.shape[0] * num_videos_per_prompt
        if num_videos_per_prompt > 1:
            prompt_embeds = jnp.repeat(prompt_embeds, num_videos_per_prompt, axis=0)
            if negative_embeds is not None:
                negative_embeds = jnp.repeat(negative_embeds, num_videos_per_prompt, axis=0)

        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        latent_height = height // self.vae_scale_factor_spatial
        latent_width = width // self.vae_scale_factor_spatial
        shape = (batch_size, transformer.config.in_channels, num_latent_frames,
                 latent_height, latent_width)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)
        latents = latents * self.scheduler.config.sigma_max
        padding_mask = jnp.zeros((1, 1, height, width), dtype=latents.dtype)

        state = self.scheduler.set_timesteps(num_inference_steps)
        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg, fps=fps),
            static=(guidance_scale, do_cfg, fps, num_inference_steps),
        )
        latents = denoise(tr_params, latents, prompt_embeds, negative_embeds, state, padding_mask)

        if output_type == "latent":
            video = latents
        else:
            sigma_data = self.scheduler.config.sigma_data
            latents_mean = getattr(vae.config, "latents_mean", None)
            if latents_mean is not None:
                C = vae.config.latent_channels
                mean = jnp.asarray(latents_mean, dtype=latents.dtype).reshape(1, C, -1, 1, 1)
                std = jnp.asarray(vae.config.latents_std, dtype=latents.dtype).reshape(1, C, -1, 1, 1)
                latents = latents * std[:, :, : latents.shape[2]] / sigma_data + mean[:, :, : latents.shape[2]]
            else:
                latents = latents / sigma_data
            decode = self._jit("decode", lambda p, z: vae.decode(p, z).sample)
            video = decode(vae_params, latents)
            video = self.video_processor.postprocess_video(video, output_type=output_type)

        if not return_dict:
            return (video,)
        return CosmosPipelineOutput(frames=video)
