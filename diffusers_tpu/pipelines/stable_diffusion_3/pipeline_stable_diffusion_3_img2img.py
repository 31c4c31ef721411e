"""Stable Diffusion 3 image-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/stable_diffusion_3/pipeline_stable_diffusion_3_img2img.py`):
VAE-encode the input, rectified-flow forward process to the
strength-selected timestep (`scale_noise`: σ·noise + (1−σ)·x₀), then the
same single-scan flow-match denoise over the truncated schedule.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ..inpaint_utils import check_strength_and_schedule
from .pipeline_stable_diffusion_3 import StableDiffusion3Pipeline, StableDiffusion3PipelineOutput

logger = logging.get_logger(__name__)


class StableDiffusion3Img2ImgPipeline(StableDiffusion3Pipeline):
    def _encode_image_latents(self, image, batch_size, enc_key):
        vae, vae_params = self.vae
        init = jnp.asarray(self.image_processor.preprocess(image))
        init_latents = vae.encode(vae_params, init).sample(enc_key)
        if vae.config.get("shift_factor") is not None:
            init_latents = init_latents - vae.config.shift_factor
        init_latents = init_latents * vae.config.scaling_factor
        if init_latents.shape[0] < batch_size:
            if batch_size % init_latents.shape[0] != 0:
                raise ValueError(
                    f"Cannot broadcast {init_latents.shape[0]} init images to batch {batch_size}."
                )
            init_latents = jnp.repeat(init_latents, batch_size // init_latents.shape[0], axis=0)
        return init_latents

    def get_timesteps(self, state, num_inference_steps: int, strength: float):
        init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
        t_start = max(num_inference_steps - init_timestep, 0)
        timesteps = state.timesteps[t_start:]
        check_strength_and_schedule(strength, timesteps)
        return timesteps

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        image=None,
        strength: float = 0.6,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.0,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        max_sequence_length: int = 256,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        if not 0 <= strength <= 1:
            raise ValueError(f"strength must be in [0, 1], got {strength}")

        do_cfg = guidance_scale > 1.0
        prompt_embeds, neg_embeds, pooled, neg_pooled = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length
        )
        batch_size = prompt_embeds.shape[0] * num_images_per_prompt
        if num_images_per_prompt != 1:
            reps = num_images_per_prompt
            prompt_embeds = jnp.repeat(prompt_embeds, reps, axis=0)
            pooled = jnp.repeat(pooled, reps, axis=0)
            if do_cfg:
                neg_embeds = jnp.repeat(neg_embeds, reps, axis=0)
                neg_pooled = jnp.repeat(neg_pooled, reps, axis=0)
        if do_cfg:
            prompt_embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            pooled = jnp.concatenate([neg_pooled, pooled], axis=0)

        key, enc_key, noise_key = jax.random.split(key, 3)
        init_latents = self._encode_image_latents(image, batch_size, enc_key)

        state = self.scheduler.set_timesteps(num_inference_steps)
        timesteps = self.get_timesteps(state, num_inference_steps, strength)
        noise = randn_tensor(init_latents.shape, key=noise_key)
        latents = self.scheduler.scale_noise(state, init_latents, timesteps[:1], noise)

        denoise = self._jit("denoise", partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
                            static=(guidance_scale, do_cfg))
        latents = denoise(t_params, latents, prompt_embeds, pooled, timesteps, state)

        if output_type == "latent":
            image_out = latents
        else:
            def decode(p, z):
                z = z / vae.config.scaling_factor
                if vae.config.get("shift_factor") is not None:
                    z = z + vae.config.shift_factor
                return vae.decode(p, z).sample

            image_out = self._jit("decode", decode)(vae_params, latents)
            image_out = self.image_processor.postprocess(image_out, output_type=output_type)

        if not return_dict:
            return (image_out,)
        return StableDiffusion3PipelineOutput(images=image_out)
