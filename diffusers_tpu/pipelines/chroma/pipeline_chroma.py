"""Chroma text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/chroma/pipeline_chroma.py`): masked
T5 encoding where all but the first padding token are masked (`:248-251`),
true CFG with negative embeds, Flux-style packed latents and dynamic time
shifting, joint attention mask extended over image tokens (`:545`).
TPU-first: one jitted `lax.scan` over all steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..flux.pipeline_flux import FluxPipeline
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class ChromaPipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class ChromaPipeline(DiffusionPipeline):
    def __init__(self, scheduler, vae, text_encoder, tokenizer, transformer):
        super().__init__()
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
            transformer=transformer, scheduler=scheduler,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor * 2)

    _pack_latents = staticmethod(FluxPipeline._pack_latents)
    _unpack_latents = staticmethod(FluxPipeline._unpack_latents)
    _prepare_latent_image_ids = staticmethod(FluxPipeline._prepare_latent_image_ids)

    def _get_t5_prompt_embeds(self, prompt: List[str], max_sequence_length: int):
        text_encoder, te_params = self.text_encoder
        inputs = self.tokenizer(
            prompt,
            padding="max_length",
            max_length=max_sequence_length,
            truncation=True,
            return_tensors="np",
        )
        ids = jnp.asarray(inputs.input_ids)
        tok_mask = jnp.asarray(inputs.attention_mask)
        embeds = text_encoder(te_params, ids, attention_mask=tok_mask).last_hidden_state
        # keep the first padding token attended (reference `:248-251`)
        seq_lengths = jnp.sum(tok_mask, axis=1)
        positions = jnp.arange(tok_mask.shape[1])[None, :]
        attn_mask = (positions <= seq_lengths[:, None]).astype(jnp.float32)
        return embeds, attn_mask

    def encode_prompt(self, prompt, negative_prompt=None, do_cfg=True, max_sequence_length: int = 512):
        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds, prompt_mask = self._get_t5_prompt_embeds(prompt, max_sequence_length)
        if not do_cfg:
            return prompt_embeds, prompt_mask, None, None
        negative_prompt = negative_prompt or ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        neg_embeds, neg_mask = self._get_t5_prompt_embeds(negative_prompt, max_sequence_length)
        return prompt_embeds, prompt_mask, neg_embeds, neg_mask

    def _denoise(self, t_params, latents, prompt_embeds, prompt_mask, img_ids, txt_ids,
                 timesteps, state, guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            timestep = jnp.broadcast_to(t, (latent_input.shape[0],)) / 1000.0
            noise_pred = transformer(
                t_params, latent_input, prompt_embeds, timestep, img_ids, txt_ids,
                attention_mask=prompt_mask,
            ).sample
            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (cond - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 40,
        guidance_scale: float = 4.5,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, prompt_mask, neg_embeds, neg_mask = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length
        )
        batch_size = prompt_embeds.shape[0]
        if do_cfg:
            prompt_embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            prompt_mask = jnp.concatenate([neg_mask, prompt_mask], axis=0)

        lh = 2 * (height // (self.vae_scale_factor * 2))
        lw = 2 * (width // (self.vae_scale_factor * 2))
        num_channels_latents = transformer.config.in_channels // 4
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, num_channels_latents, lh, lw), key=lat_key)
            latents = self._pack_latents(latents)
        img_ids = jnp.asarray(self._prepare_latent_image_ids(lh // 2, lw // 2))
        txt_ids = jnp.zeros((prompt_embeds.shape[1], 3), jnp.float32)

        sigmas = np.linspace(1.0, 1 / num_inference_steps, num_inference_steps)
        image_seq_len = latents.shape[1]
        mu = calculate_shift(
            image_seq_len,
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sigmas=sigmas, mu=mu)
        except (TypeError, ValueError):
            state = self.scheduler.set_timesteps(num_inference_steps)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg),
        )
        latents = denoise(t_params, latents, prompt_embeds, prompt_mask, img_ids, txt_ids,
                          state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            latents = self._unpack_latents(latents, height, width, self.vae_scale_factor)
            decode = self._jit(
                "decode",
                lambda p, z: vae.decode(
                    p,
                    z / vae.config.scaling_factor + (vae.config.shift_factor or 0.0),
                ).sample,
            )
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return ChromaPipelineOutput(images=image)
