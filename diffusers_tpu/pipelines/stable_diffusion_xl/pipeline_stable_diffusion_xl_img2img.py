"""SDXL image-to-image pipeline (reference
`pipelines/stable_diffusion_xl/pipeline_stable_diffusion_xl_img2img.py`)."""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import logging
from ...utils.jax_utils import randn_tensor
from .pipeline_stable_diffusion_xl import StableDiffusionXLPipeline, StableDiffusionXLPipelineOutput

logger = logging.get_logger(__name__)


class StableDiffusionXLImg2ImgPipeline(StableDiffusionXLPipeline):
    def _denoise_from(self, unet_params, prompt_embeds, add_text_embeds, add_time_ids, latents,
                      timesteps, state, guidance_scale, do_cfg):
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
                added_cond_kwargs={"text_embeds": add_text_embeds, "time_ids": add_time_ids},
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
        prompt_2: Optional[Union[str, List[str]]] = None,
        image=None,
        strength: float = 0.3,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        negative_prompt_2: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        init = jnp.asarray(self.image_processor.preprocess(image))
        height, width = init.shape[-2] , init.shape[-1]
        original_size = original_size or (height, width)
        target_size = target_size or (height, width)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds, pooled, negative_pooled = self.encode_prompt(
            prompt, prompt_2, negative_prompt, negative_prompt_2, do_cfg
        )
        batch_size = prompt_embeds.shape[0]
        add_time_ids = self._get_add_time_ids(original_size, crops_coords_top_left, target_size, batch_size)
        if do_cfg:
            prompt_embeds = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)
            add_text_embeds = jnp.concatenate([negative_pooled, pooled], axis=0)
            add_time_ids = jnp.concatenate([add_time_ids, add_time_ids], axis=0)
        else:
            add_text_embeds = pooled

        key, enc_key, noise_key = jax.random.split(key, 3)
        init_latents = vae.encode(vae_params, init).sample(enc_key) * vae.config.scaling_factor
        if init_latents.shape[0] < batch_size:
            init_latents = jnp.repeat(init_latents, batch_size // init_latents.shape[0], axis=0)

        state = self.scheduler.set_timesteps(num_inference_steps)
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, init_latents)
        init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
        t_start = max(num_inference_steps - init_timestep, 0)
        timesteps = state.timesteps[t_start * self.scheduler.order:]

        noise = randn_tensor(init_latents.shape, key=noise_key)
        latents = self.scheduler.add_noise(state, init_latents, noise, timesteps[:1])

        denoise = self._jit("denoise", partial(self._denoise_from, guidance_scale=guidance_scale, do_cfg=do_cfg),
                            static=(guidance_scale, do_cfg))
        latents = denoise(unet_params, prompt_embeds, add_text_embeds, add_time_ids, latents, timesteps, state)

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = decode(vae_params, latents)
            image_out = self.image_processor.postprocess(image_out, output_type=output_type)

        if not return_dict:
            return (image_out,)
        return StableDiffusionXLPipelineOutput(images=image_out)
