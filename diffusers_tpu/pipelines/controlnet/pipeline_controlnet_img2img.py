"""Stable Diffusion + ControlNet image-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/controlnet/pipeline_controlnet_img2img.py`):
VAE-encoded init image with strength-truncated schedule (img2img semantics)
+ ControlNet residuals inside the scanned denoise loop.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ..inpaint_utils import check_strength_and_schedule, repeat_to_batch
from ..stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipelineOutput
from .pipeline_controlnet import StableDiffusionControlNetPipeline

logger = logging.get_logger(__name__)


class StableDiffusionControlNetImg2ImgPipeline(StableDiffusionControlNetPipeline):
    def get_timesteps(self, state, num_inference_steps: int, strength: float):
        init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
        t_start = max(num_inference_steps - init_timestep, 0)
        return state.timesteps[t_start * self.scheduler.order:], num_inference_steps - t_start

    def _denoise_cn_from(self, unet_params, cn_params, prompt_embeds, latents, cond_image,
                         timesteps, state, guidance_scale, do_cfg, conditioning_scale, guess_mode):
        unet = self.unet[0]
        controlnet = self.controlnet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            t_b = jnp.broadcast_to(t, (latent_input.shape[0],))
            cn_out = controlnet(
                cn_params, latent_input, t_b, prompt_embeds, cond_image,
                conditioning_scale=conditioning_scale, guess_mode=guess_mode,
            )
            noise_pred = unet(
                unet_params, latent_input, t_b,
                encoder_hidden_states=prompt_embeds,
                down_block_additional_residuals=cn_out.down_block_res_samples,
                mid_block_additional_residual=cn_out.mid_block_res_sample,
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
        control_image=None,
        strength: float = 0.8,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        controlnet_conditioning_scale: float = 1.0,
        guess_mode: bool = False,
        key: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        controlnet, cn_params = self.controlnet
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        cond = jnp.asarray(self.image_processor.preprocess(control_image)) \
            if not isinstance(control_image, jnp.ndarray) else control_image
        cond = jnp.clip((cond + 1) / 2, 0, 1) if float(cond.min()) < 0 else cond

        do_cfg = guidance_scale > 1.0
        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)
        if do_cfg:
            cond = jnp.tile(cond, (2 * batch_size // cond.shape[0], 1, 1, 1))

        init = jnp.asarray(self.image_processor.preprocess(image))
        key, enc_key, noise_key = jax.random.split(key, 3)
        init_latents = vae.encode(vae_params, init).sample(enc_key) * vae.config.scaling_factor
        init_latents = repeat_to_batch(init_latents, batch_size, what="image")

        state = self.scheduler.set_timesteps(num_inference_steps)
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, init_latents)
        timesteps, _ = self.get_timesteps(state, num_inference_steps, strength)
        check_strength_and_schedule(strength, timesteps)

        noise = randn_tensor(init_latents.shape, key=noise_key)
        latents = self.scheduler.add_noise(state, init_latents, noise, timesteps[:1])

        denoise = self._jit(
            "denoise_i2i",
            partial(self._denoise_cn_from, guidance_scale=guidance_scale, do_cfg=do_cfg,
                    conditioning_scale=controlnet_conditioning_scale, guess_mode=guess_mode),
            static=(guidance_scale, do_cfg, controlnet_conditioning_scale, guess_mode),
        )
        latents = denoise(unet_params, cn_params, prompt_embeds, latents, cond, timesteps, state)

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = self.image_processor.postprocess(decode(vae_params, latents), output_type=output_type)

        if not return_dict:
            return (image_out,)
        return StableDiffusionPipelineOutput(images=image_out)
