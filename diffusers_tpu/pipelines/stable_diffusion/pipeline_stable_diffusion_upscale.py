"""Stable Diffusion x4 upscaler.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/stable_diffusion/
pipeline_stable_diffusion_upscale.py:66`): a 7-channel-input SD UNet sees the
(noise-level-degraded) low-res image concatenated on the channel axis at
latent resolution, conditioned on `class_labels=noise_level`; the upscaler
VAE decodes latents at 4× spatial scale. Denoise loop is one `lax.scan`."""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...utils.jax_utils import randn_tensor
from .pipeline_stable_diffusion import StableDiffusionPipeline, StableDiffusionPipelineOutput


class StableDiffusionUpscalePipeline(StableDiffusionPipeline):
    def __init__(self, vae, text_encoder, tokenizer, unet, low_res_scheduler, scheduler):
        # bypass the SD __init__ (different component set: + low_res_scheduler)
        from ...image_processor import VaeImageProcessor
        from ..pipeline_utils import DiffusionPipeline

        DiffusionPipeline.__init__(self)
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer, unet=unet,
            low_res_scheduler=low_res_scheduler, scheduler=scheduler,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1)
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor, resample="bicubic")

    def _denoise_upscale(self, unet_params, prompt_embeds, latents, image, noise_level, state,
                         guidance_scale, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            reps = 2 if do_cfg else 1
            latent_input = jnp.concatenate([latents] * reps, axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            latent_input = jnp.concatenate([latent_input, image], axis=1)
            noise_pred = unet(
                unet_params,
                latent_input,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds,
                class_labels=noise_level,
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
        image=None,
        num_inference_steps: int = 75,
        guidance_scale: float = 9.0,
        noise_level: int = 20,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_classifier_free_guidance=do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        # low-res conditioning image, degraded to `noise_level`
        # (reference `:612-620`)
        init = jnp.asarray(self.image_processor.preprocess(image))
        if init.shape[0] < batch_size:
            init = jnp.repeat(init, batch_size // init.shape[0], axis=0)
        noise_level_arr = jnp.full((init.shape[0],), noise_level, dtype=jnp.int32)
        key, lr_key, lat_key = jax.random.split(key, 3)
        lr_state = self.low_res_scheduler.set_timesteps(self.low_res_scheduler.config.num_train_timesteps)
        init = self.low_res_scheduler.add_noise(
            lr_state, init, randn_tensor(init.shape, key=lr_key), noise_level_arr
        )
        if do_cfg:
            init = jnp.concatenate([init, init], axis=0)
            noise_level_arr = jnp.concatenate([noise_level_arr, noise_level_arr], axis=0)

        h, w = init.shape[-2], init.shape[-1]
        shape = (batch_size, vae.config.latent_channels, h, w)  # latent res == low-res image res
        if latents is None:
            latents = randn_tensor(shape, key=lat_key)

        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, latents)

        denoise = self._jit(
            "denoise_upscale",
            partial(self._denoise_upscale, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg),
        )
        latents = denoise(unet_params, prompt_embeds, latents, init, noise_level_arr, state)

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = decode(vae_params, latents)
            image_out = self.image_processor.postprocess(image_out, output_type=output_type)

        if not return_dict:
            return (image_out,)
        return StableDiffusionPipelineOutput(images=image_out)
