"""Kolors text-to-image with Perturbed Attention Guidance.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/pag/pipeline_pag_kolors.py`):
Kolors' ChatGLM-conditioned SDXL UNet with the PAG perturbed conditional
inside the scanned denoise step (`pag_utils.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils import logging
from ..kolors.pipeline_kolors import KolorsPipeline
from .pag_utils import PAGMixin

logger = logging.get_logger(__name__)


class KolorsPAGPipeline(PAGMixin, KolorsPipeline):
    def _denoise(self, unet_params, prompt_embeds, add_text_embeds, add_time_ids, latents,
                 guidance_scale, num_inference_steps, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)
        cond_embeds = self._cond_half(prompt_embeds, do_cfg)
        cond_added = {
            "text_embeds": self._cond_half(add_text_embeds, do_cfg),
            "time_ids": self._cond_half(add_time_ids, do_cfg),
        }

        def step_fn(carry, scan_in):
            i, t = scan_in
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = unet(
                unet_params, latent_input, jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds,
                added_cond_kwargs={"text_embeds": add_text_embeds, "time_ids": add_time_ids},
            ).sample
            cond_input = scheduler.scale_model_input(sstate, latents, t)
            noise_perturb = self._pag_cond_forward(
                unet, unet_params, cond_input,
                jnp.broadcast_to(t, (cond_input.shape[0],)), cond_embeds,
                added_cond_kwargs=cond_added,
            )
            pred = self._pag_combine(noise_pred, noise_perturb, i, num_inference_steps, guidance_scale, do_cfg)
            out = scheduler.step(sstate, pred, t, latents)
            return (out.prev_sample, out.state), None

        steps = jnp.arange(state.timesteps.shape[0], dtype=jnp.float32)
        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (steps, state.timesteps))
        return latents
