"""Kolors text-to-image pipeline (SDXL-class UNet + ChatGLM3 conditioning).

Behavioral mirror of the reference
`pipelines/kolors/pipeline_kolors.py`: ChatGLM encode with
`hidden_states[-2]` as the sequence embeds and the LAST TOKEN of the
pre-final-LN hidden state as the pooled embeds (`:277-279`),
max_sequence_length 256, SDXL micro-conditioning time_ids
(`_get_add_time_ids` `:562`), CFG as batch-2 single-scan denoise.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class KolorsPipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class KolorsPipeline(DiffusionPipeline):
    _optional_components = ["image_encoder", "feature_extractor"]

    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler,
                 image_encoder=None, feature_extractor=None,
                 force_zeros_for_empty_prompt: bool = False):
        super().__init__()
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer, unet=unet,
            scheduler=scheduler, image_encoder=image_encoder, feature_extractor=feature_extractor,
        )
        self.register_to_config(force_zeros_for_empty_prompt=force_zeros_for_empty_prompt)
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        self.default_sample_size = self.unet[0].config.sample_size

    def encode_prompt(self, prompt, negative_prompt, do_cfg: bool, max_sequence_length: int = 256):
        text_encoder, te_params = self.text_encoder
        if isinstance(prompt, str):
            prompt = [prompt]

        def encode(texts):
            inputs = self.tokenizer(
                texts, padding="max_length", max_length=max_sequence_length,
                truncation=True, return_tensors="np",
            )
            ids = jnp.asarray(inputs.input_ids)
            mask = jnp.asarray(inputs.attention_mask)
            out = text_encoder(te_params, ids, attention_mask=mask, output_hidden_states=True)
            embeds = out.hidden_states[-2]
            pooled = out.hidden_states[-1][:, -1, :]
            return embeds, pooled

        prompt_embeds, pooled = encode(prompt)
        negative_embeds = negative_pooled = None
        if do_cfg:
            if negative_prompt is None and self.config.get("force_zeros_for_empty_prompt"):
                negative_embeds = jnp.zeros_like(prompt_embeds)
                negative_pooled = jnp.zeros_like(pooled)
            else:
                negative_prompt = negative_prompt or ""
                if isinstance(negative_prompt, str):
                    negative_prompt = [negative_prompt] * len(prompt)
                negative_embeds, negative_pooled = encode(negative_prompt)
        return prompt_embeds, negative_embeds, pooled, negative_pooled

    def _get_add_time_ids(self, original_size, crops_coords_top_left, target_size, batch: int):
        add_time_ids = list(original_size + crops_coords_top_left + target_size)
        return jnp.asarray([add_time_ids] * batch, dtype=jnp.float32)

    def _denoise(self, unet_params, prompt_embeds, add_text_embeds, add_time_ids, latents,
                 guidance_scale, num_inference_steps, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = unet(
                unet_params, latent_input, jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds,
                added_cond_kwargs={"text_embeds": add_text_embeds, "time_ids": add_time_ids},
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), state.timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
        max_sequence_length: int = 256,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        original_size = original_size or (height, width)
        target_size = target_size or (height, width)
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds, pooled, negative_pooled = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length=max_sequence_length
        )
        batch_size = prompt_embeds.shape[0] * num_images_per_prompt
        if num_images_per_prompt != 1:
            prompt_embeds = jnp.repeat(prompt_embeds, num_images_per_prompt, axis=0)
            pooled = jnp.repeat(pooled, num_images_per_prompt, axis=0)
            if do_cfg:
                negative_embeds = jnp.repeat(negative_embeds, num_images_per_prompt, axis=0)
                negative_pooled = jnp.repeat(negative_pooled, num_images_per_prompt, axis=0)

        add_time_ids = self._get_add_time_ids(original_size, crops_coords_top_left, target_size, batch_size)
        if do_cfg:
            prompt_embeds = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)
            add_text_embeds = jnp.concatenate([negative_pooled, pooled], axis=0)
            add_time_ids = jnp.concatenate([add_time_ids, add_time_ids], axis=0)
        else:
            add_text_embeds = pooled

        shape = (batch_size, unet.config.in_channels, height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            latents = randn_tensor(shape, key=key)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale,
                    num_inference_steps=num_inference_steps, do_cfg=do_cfg),
            static=(guidance_scale, num_inference_steps, do_cfg),
        )
        latents = denoise(unet_params, prompt_embeds, add_text_embeds, add_time_ids, latents)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return KolorsPipelineOutput(images=image)
