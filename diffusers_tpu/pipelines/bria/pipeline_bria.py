"""Bria text-to-image pipeline.

Behavioral mirror of the reference `pipelines/bria/pipeline_bria.py`:
T5 conditioning with zero-padded negatives, true CFG (non-distilled),
Flux-style packed latents and position ids, raw (un-divided) timesteps
into the transformer, optional prediction normalization/clipping.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..flux.pipeline_flux import FluxPipeline
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class BriaPipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class BriaPipeline(DiffusionPipeline):
    _pack_latents = staticmethod(FluxPipeline._pack_latents)
    _unpack_latents = staticmethod(FluxPipeline._unpack_latents)
    _prepare_latent_image_ids = staticmethod(FluxPipeline._prepare_latent_image_ids)

    def __init__(self, transformer, scheduler, vae, text_encoder, tokenizer):
        super().__init__()
        self.register_modules(
            transformer=transformer, scheduler=scheduler, vae=vae,
            text_encoder=text_encoder, tokenizer=tokenizer,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self.default_sample_size = 64

    def encode_prompt(self, prompt, negative_prompt, do_cfg: bool, max_sequence_length: int = 128):
        text_encoder, te_params = self.text_encoder

        def encode(texts):
            inputs = self.tokenizer(
                texts, padding="max_length", max_length=max_sequence_length,
                truncation=True, return_tensors="np",
            )
            ids = jnp.asarray(inputs.input_ids)
            mask = jnp.asarray(inputs.attention_mask)
            embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
            return embeds * mask[..., None].astype(embeds.dtype)

        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds = encode(prompt)
        negative_embeds = None
        if do_cfg:
            negative_prompt = negative_prompt or ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            negative_embeds = encode(negative_prompt)
        return prompt_embeds, negative_embeds

    def _denoise(self, tr_params, latents, prompt_embeds, img_ids, txt_ids, timesteps, state,
                 guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            noise_pred = transformer(
                tr_params, latent_input, encoder_hidden_states=prompt_embeds,
                timestep=jnp.broadcast_to(t, (latent_input.shape[0],)),
                img_ids=img_ids, txt_ids=txt_ids,
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 30,
        guidance_scale: float = 5.0,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 128,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, tr_params = self.transformer
        vae, vae_params = self.vae
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0

        prompt_embeds, negative_embeds = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length=max_sequence_length
        )
        if do_cfg:
            prompt_embeds = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1) * num_images_per_prompt

        lh = 2 * (height // (self.vae_scale_factor * 2))
        lw = 2 * (width // (self.vae_scale_factor * 2))
        num_channels = transformer.config.in_channels // 4
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, num_channels, lh, lw), key=lat_key)
        latents = self._pack_latents(latents)
        img_ids = jnp.asarray(self._prepare_latent_image_ids(lh // 2, lw // 2))
        txt_ids = jnp.zeros((prompt_embeds.shape[1], 3))

        state = self.scheduler.set_timesteps(num_inference_steps)
        if hasattr(state, "init_noise_sigma"):
            latents = latents * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, latents)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, num_inference_steps),
        )
        latents = denoise(tr_params, latents, prompt_embeds, img_ids, txt_ids,
                          state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            latents = self._unpack_latents(latents, height, width, self.vae_scale_factor)
            shift = getattr(vae.config, "shift_factor", 0.0) or 0.0
            decode = self._jit(
                "decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor + shift).sample
            )
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return BriaPipelineOutput(images=image)
