"""Stable Diffusion image-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/stable_diffusion/pipeline_stable_diffusion_img2img.py`):
VAE-encode the init image, add noise at `strength`-truncated schedule, denoise
the remaining steps in one scanned jit.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import logging
from ...utils.jax_utils import randn_tensor
from .pipeline_stable_diffusion import StableDiffusionPipeline, StableDiffusionPipelineOutput

logger = logging.get_logger(__name__)


class StableDiffusionImg2ImgPipeline(StableDiffusionPipeline):
    def get_timesteps(self, state, num_inference_steps: int, strength: float):
        init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
        t_start = max(num_inference_steps - init_timestep, 0)
        return state.timesteps[t_start * self.scheduler.order :], num_inference_steps - t_start

    def _denoise_from(self, unet_params, prompt_embeds, latents, timesteps, state, guidance_scale, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = unet(
                unet_params,
                latent_input,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds,
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
        image=None,
        strength: float = 0.8,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        if strength < 0 or strength > 1:
            raise ValueError(f"strength must be in [0, 1], got {strength}")

        do_cfg = guidance_scale > 1.0
        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        # encode init image → latents
        init = self.image_processor.preprocess(image)
        init = jnp.asarray(init)
        key, enc_key, noise_key = jax.random.split(key, 3)
        init_latents = vae.encode(vae_params, init).sample(enc_key) * vae.config.scaling_factor
        if init_latents.shape[0] < batch_size:
            init_latents = jnp.repeat(init_latents, batch_size // init_latents.shape[0], axis=0)

        state = self.scheduler.set_timesteps(num_inference_steps)
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, init_latents)
        timesteps, _ = self.get_timesteps(state, num_inference_steps, strength)
        latent_timestep = timesteps[:1]

        noise = randn_tensor(init_latents.shape, key=noise_key)
        latents = self.scheduler.add_noise(state, init_latents, noise, latent_timestep)

        denoise = self._jit("denoise", partial(self._denoise_from, guidance_scale=guidance_scale, do_cfg=do_cfg),
                            static=(guidance_scale, do_cfg))
        latents = denoise(unet_params, prompt_embeds, latents, timesteps, state)

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = decode(vae_params, latents)
            image_out = self.image_processor.postprocess(image_out, output_type=output_type)

        if not return_dict:
            return (image_out,)
        return StableDiffusionPipelineOutput(images=image_out)
