"""SDXL inpainting with Perturbed Attention Guidance.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/pag/pipeline_pag_sd_xl_inpaint.py`):
4-channel latent-blend or 9-channel inpaint-UNet path with SDXL
micro-conditioning, PAG perturbed conditional in-scan (`pag_utils.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils import logging
from ..stable_diffusion_xl.pipeline_stable_diffusion_xl_inpaint import StableDiffusionXLInpaintPipeline
from .pag_utils import PAGMixin

logger = logging.get_logger(__name__)


class StableDiffusionXLPAGInpaintPipeline(PAGMixin, StableDiffusionXLInpaintPipeline):
    def _denoise_inpaint(
        self, unet_params, prompt_embeds, add_text_embeds, add_time_ids, latents, init_latents,
        mask, mask_latents_input, timesteps, state, noise, guidance_scale, do_cfg, is_inpaint_unet,
    ):
        unet = self.unet[0]
        scheduler = self.scheduler
        cond_embeds = self._cond_half(prompt_embeds, do_cfg)
        cond_extra = self._cond_half(mask_latents_input, do_cfg)
        cond_added = {
            "text_embeds": self._cond_half(add_text_embeds, do_cfg),
            "time_ids": self._cond_half(add_time_ids, do_cfg),
        }
        n_steps = timesteps.shape[0]

        def step_fn(carry, scan_in):
            i, t = scan_in
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            if is_inpaint_unet:
                latent_input = jnp.concatenate([latent_input, mask_latents_input], axis=1)
            noise_pred = unet(
                unet_params, latent_input,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds,
                added_cond_kwargs={"text_embeds": add_text_embeds, "time_ids": add_time_ids},
            ).sample
            cond_input = scheduler.scale_model_input(sstate, latents, t)
            if is_inpaint_unet:
                cond_input = jnp.concatenate([cond_input, cond_extra], axis=1)
            noise_perturb = self._pag_cond_forward(
                unet, unet_params, cond_input,
                jnp.broadcast_to(t, (cond_input.shape[0],)), cond_embeds,
                added_cond_kwargs=cond_added,
            )
            pred = self._pag_combine(noise_pred, noise_perturb, i, n_steps, guidance_scale, do_cfg)
            out = scheduler.step(sstate, pred, t, latents)
            new_latents = out.prev_sample
            if not is_inpaint_unet:
                noised_init = scheduler.add_noise(sstate, init_latents, noise, jnp.broadcast_to(t, (1,)))
                new_latents = (1 - mask) * noised_init + mask * new_latents
            return (new_latents, out.state), None

        steps = jnp.arange(n_steps, dtype=jnp.float32)
        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (steps, timesteps))
        return latents
