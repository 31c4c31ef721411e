"""Stable Diffusion 3 inpainting pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/stable_diffusion_3/pipeline_stable_diffusion_3_inpaint.py`):
16-channel latent blend — at every step the region outside the mask is
replaced with the original latents re-noised to the NEXT step's sigma
(`scale_noise`), inside the scanned jit.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ..inpaint_utils import as_mask_array, resize_mask_nearest
from .pipeline_stable_diffusion_3_img2img import StableDiffusion3Img2ImgPipeline
from .pipeline_stable_diffusion_3 import StableDiffusion3PipelineOutput

logger = logging.get_logger(__name__)


class StableDiffusion3InpaintPipeline(StableDiffusion3Img2ImgPipeline):
    def _denoise_inpaint(self, t_params, latents, init_latents, mask, noise, prompt_embeds, pooled,
                         timesteps, state, guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        n = timesteps.shape[0]

        def step_fn(carry, scan_in):
            i, t = scan_in
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            timestep = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = transformer(
                t_params, latent_input, prompt_embeds, pooled, timestep
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            # re-noise the original to the NEXT step's level; last step uses x0
            next_t = jnp.where(i + 1 < n, timesteps[jnp.minimum(i + 1, n - 1)], timesteps[-1])
            proper = jnp.where(
                i + 1 < n,
                scheduler.scale_noise(sstate, init_latents, jnp.broadcast_to(next_t, (1,)), noise),
                init_latents,
            )
            blended = (1.0 - mask) * proper + mask * out.prev_sample
            return (blended, out.state), None

        steps = jnp.arange(n)
        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (steps, timesteps))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        image=None,
        mask_image=None,
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

        mask = as_mask_array(mask_image)
        lh, lw = init_latents.shape[2], init_latents.shape[3]
        mask_latent = jnp.asarray(resize_mask_nearest(mask, lh, lw))

        state = self.scheduler.set_timesteps(num_inference_steps)
        timesteps = self.get_timesteps(state, num_inference_steps, strength)
        noise = randn_tensor(init_latents.shape, key=noise_key)
        latents = self.scheduler.scale_noise(state, init_latents, timesteps[:1], noise)

        denoise = self._jit(
            "denoise_inpaint",
            partial(self._denoise_inpaint, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg),
        )
        latents = denoise(t_params, latents, init_latents, mask_latent, noise, prompt_embeds, pooled,
                          timesteps, state)

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
