"""Latte text-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/latte/pipeline_latte.py`): masked T5
encoding (PixArt-style), CFG batch-2 denoise over [B, C, F, H/8, W/8] latents
with the factorised spatial/temporal DiT, per-frame VAE decode. TPU-first:
one jitted `lax.scan`.
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
class LattePipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class LattePipeline(DiffusionPipeline):
    def __init__(self, tokenizer, text_encoder, vae, transformer, scheduler):
        super().__init__()
        self.register_modules(
            tokenizer=tokenizer, text_encoder=text_encoder, vae=vae,
            transformer=transformer, scheduler=scheduler,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.video_processor = VideoProcessor(vae_scale_factor=self.vae_scale_factor)

    def _encode(self, prompt: List[str], max_sequence_length: int):
        text_encoder, te_params = self.text_encoder
        inputs = self.tokenizer(
            prompt,
            padding="max_length",
            max_length=max_sequence_length,
            truncation=True,
            return_tensors="np",
        )
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask)
        embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
        return embeds, mask

    def encode_prompt(self, prompt, negative_prompt=None, do_cfg=True, max_sequence_length: int = 120):
        if isinstance(prompt, str):
            prompt = [prompt]
        embeds, mask = self._encode(prompt, max_sequence_length)
        if not do_cfg:
            return embeds, mask
        negative_prompt = negative_prompt or ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        neg, neg_mask = self._encode(negative_prompt, max_sequence_length)
        return jnp.concatenate([neg, embeds], axis=0), jnp.concatenate([neg_mask, mask], axis=0)

    def _denoise(self, t_params, latents, prompt_embeds, prompt_mask, timesteps, state,
                 guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            timestep = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = transformer(
                t_params, latent_input, timestep, prompt_embeds,
                encoder_attention_mask=prompt_mask,
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            # learn-sigma: keep the epsilon half (reference `:841`)
            if noise_pred.shape[1] == 2 * latents.shape[1]:
                noise_pred = jnp.split(noise_pred, 2, axis=1)[0]
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def _decode(self, vae_params, latents):
        vae = self.vae[0]
        b, c, f, h, w = latents.shape
        latents = jnp.transpose(latents, (0, 2, 1, 3, 4)).reshape(b * f, c, h, w)
        video = vae.decode(vae_params, latents / vae.config.scaling_factor).sample
        video = video.reshape(b, f, video.shape[1], video.shape[2], video.shape[3])
        return jnp.clip(video / 2 + 0.5, 0.0, 1.0)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 512,
        width: int = 512,
        video_length: int = 16,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 120,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, prompt_mask = self.encode_prompt(prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        shape = (
            batch_size,
            transformer.config.in_channels,
            video_length,
            height // self.vae_scale_factor,
            width // self.vae_scale_factor,
        )
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)

        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, latents)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, num_inference_steps),
        )
        latents = denoise(t_params, latents, prompt_embeds, prompt_mask, state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            video = self._jit("decode", self._decode)(vae_params, latents)
            video = np.asarray(jnp.transpose(video, (0, 1, 3, 4, 2)))

        if not return_dict:
            return (video,)
        return LattePipelineOutput(frames=video)
