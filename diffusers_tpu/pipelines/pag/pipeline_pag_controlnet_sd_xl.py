"""SDXL + ControlNet with Perturbed Attention Guidance.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/pag/pipeline_pag_controlnet_sd_xl.py`):
ControlNet residuals feed all branches; perturbed conditional with identity
self-attention in the selected UNet layers (`pag_utils.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils import logging
from ..controlnet.pipeline_controlnet_sd_xl import StableDiffusionXLControlNetPipeline
from .pag_utils import PAGMixin

logger = logging.get_logger(__name__)


class StableDiffusionXLControlNetPAGPipeline(PAGMixin, StableDiffusionXLControlNetPipeline):
    def _denoise_cn(self, unet_params, cn_params, prompt_embeds, add_text_embeds, add_time_ids,
                    latents, cond_image, guidance_scale, num_inference_steps, do_cfg,
                    conditioning_scale, guess_mode):
        unet = self.unet[0]
        controlnet = self.controlnet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)

        added = {"text_embeds": add_text_embeds, "time_ids": add_time_ids}
        cond_embeds = self._cond_half(prompt_embeds, do_cfg)
        cond_added = self._cond_half(added, do_cfg)
        cond_image_cond = jax.tree_util.tree_map(lambda x: self._cond_half(x, do_cfg), cond_image)

        def step_fn(carry, scan_in):
            i, t = scan_in
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

            cond_input = scheduler.scale_model_input(sstate, latents, t)
            t_c = jnp.broadcast_to(t, (cond_input.shape[0],))
            cn_out_c = controlnet(
                cn_params, cond_input, t_c, cond_embeds, cond_image_cond,
                conditioning_scale=conditioning_scale, guess_mode=guess_mode,
                added_cond_kwargs=cond_added,
            )
            noise_perturb = self._pag_cond_forward(
                unet, unet_params, cond_input, t_c, cond_embeds,
                added_cond_kwargs=cond_added,
                down_block_additional_residuals=cn_out_c.down_block_res_samples,
                mid_block_additional_residual=cn_out_c.mid_block_res_sample,
            )
            pred = self._pag_combine(noise_pred, noise_perturb, i, num_inference_steps, guidance_scale, do_cfg)
            out = scheduler.step(sstate, pred, t, latents)
            return (out.prev_sample, out.state), None

        steps = jnp.arange(state.timesteps.shape[0], dtype=jnp.float32)
        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (steps, state.timesteps))
        return latents
