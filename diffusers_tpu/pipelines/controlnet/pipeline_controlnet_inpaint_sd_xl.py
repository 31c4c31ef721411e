"""SDXL + ControlNet inpainting pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/controlnet/pipeline_controlnet_inpaint_sd_xl.py`):
per-step latent blend outside the mask at the next noise level, ControlNet
residuals + SDXL micro-conditioning inside one scanned jit.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ..inpaint_utils import as_mask_array, check_strength_and_schedule, repeat_to_batch, resize_mask_nearest
from ..stable_diffusion_xl.pipeline_stable_diffusion_xl import StableDiffusionXLPipelineOutput
from .pipeline_controlnet_sd_xl import StableDiffusionXLControlNetPipeline

logger = logging.get_logger(__name__)


class StableDiffusionXLControlNetInpaintPipeline(StableDiffusionXLControlNetPipeline):
    def get_timesteps(self, state, num_inference_steps: int, strength: float):
        init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
        t_start = max(num_inference_steps - init_timestep, 0)
        return state.timesteps[t_start:], num_inference_steps - t_start

    def _denoise_cn_inpaint(self, unet_params, cn_params, prompt_embeds, add_text_embeds, add_time_ids,
                            latents, init_latents, mask, noise, cond_image, timesteps, state,
                            guidance_scale, do_cfg, conditioning_scale, guess_mode):
        unet = self.unet[0]
        controlnet = self.controlnet[0]
        scheduler = self.scheduler
        n = timesteps.shape[0]
        t_next = jnp.concatenate([timesteps[1:], timesteps[-1:]])
        is_last = (jnp.arange(n) == n - 1)
        added = {"text_embeds": add_text_embeds, "time_ids": add_time_ids}

        def step_fn(carry, xs):
            t, tn, last = xs
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            t_b = jnp.broadcast_to(t, (latent_input.shape[0],))
            cn_out = controlnet(
                cn_params, latent_input, t_b, prompt_embeds, cond_image,
                conditioning_scale=conditioning_scale, guess_mode=guess_mode,
                added_cond_kwargs=added,
            )
            noise_pred = unet(
                unet_params, latent_input, t_b,
                encoder_hidden_states=prompt_embeds,
                added_cond_kwargs=added,
                down_block_additional_residuals=cn_out.down_block_res_samples,
                mid_block_additional_residual=cn_out.mid_block_res_sample,
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            proper = jnp.where(
                last, init_latents,
                scheduler.add_noise(sstate, init_latents, noise, jnp.reshape(tn, (1,))),
            )
            blended = (1.0 - mask) * proper + mask * out.prev_sample
            return (blended, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (timesteps, t_next, is_last))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        prompt_2: Optional[Union[str, List[str]]] = None,
        image=None,
        mask_image=None,
        control_image=None,
        strength: float = 0.9999,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        controlnet_conditioning_scale: float = 1.0,
        guess_mode: bool = False,
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
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
        prompt_embeds, negative_embeds, pooled, negative_pooled = self.encode_prompt(
            prompt, prompt_2, negative_prompt, None, do_cfg
        )
        batch_size = prompt_embeds.shape[0]

        init = jnp.asarray(self.image_processor.preprocess(image))
        height, width = init.shape[-2], init.shape[-1]
        mask = as_mask_array(mask_image)
        key, enc_key, noise_key = jax.random.split(key, 3)
        init_latents = vae.encode(vae_params, init).sample(enc_key) * vae.config.scaling_factor
        init_latents = repeat_to_batch(init_latents, batch_size, what="image")
        lh, lw = init_latents.shape[2], init_latents.shape[3]
        mask_latent = repeat_to_batch(
            jnp.asarray(resize_mask_nearest(mask, lh, lw)), batch_size, what="mask")

        original_size = original_size or (height, width)
        target_size = target_size or (height, width)
        add_time_ids = self._get_add_time_ids(original_size, crops_coords_top_left, target_size, batch_size)
        if do_cfg:
            prompt_embeds = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)
            add_text_embeds = jnp.concatenate([negative_pooled, pooled], axis=0)
            add_time_ids = jnp.concatenate([add_time_ids, add_time_ids], axis=0)
            cond = jnp.tile(cond, (2 * batch_size // cond.shape[0], 1, 1, 1))
        else:
            add_text_embeds = pooled

        state = self.scheduler.set_timesteps(num_inference_steps)
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, init_latents)
        timesteps, _ = self.get_timesteps(state, num_inference_steps, strength)
        check_strength_and_schedule(strength, timesteps)

        noise = randn_tensor(init_latents.shape, key=noise_key)
        latents = self.scheduler.add_noise(state, init_latents, noise, timesteps[:1])

        denoise = self._jit(
            "denoise_cn_inpaint",
            partial(self._denoise_cn_inpaint, guidance_scale=guidance_scale, do_cfg=do_cfg,
                    conditioning_scale=controlnet_conditioning_scale, guess_mode=guess_mode),
            static=(guidance_scale, do_cfg, controlnet_conditioning_scale, guess_mode),
        )
        latents = denoise(unet_params, cn_params, prompt_embeds, add_text_embeds, add_time_ids,
                          latents, init_latents, mask_latent, noise, cond, timesteps, state)

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = self.image_processor.postprocess(decode(vae_params, latents), output_type=output_type)

        if not return_dict:
            return (image_out,)
        return StableDiffusionXLPipelineOutput(images=image_out)
