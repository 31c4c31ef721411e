"""Stable Diffusion image-to-image with Perturbed Attention Guidance.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/pag/pipeline_pag_sd_img2img.py`):
strength-truncated schedule from the VAE-encoded init image, with the PAG
perturbed conditional inside the scanned denoise step (see `pag_utils.py`
for the TPU-native shape).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils import logging
from ..stable_diffusion.pipeline_stable_diffusion_img2img import StableDiffusionImg2ImgPipeline
from .pag_utils import PAGMixin

logger = logging.get_logger(__name__)


class StableDiffusionPAGImg2ImgPipeline(PAGMixin, StableDiffusionImg2ImgPipeline):
    def _denoise_from(self, unet_params, prompt_embeds, latents, timesteps, state, guidance_scale, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler
        cond_embeds = self._cond_half(prompt_embeds, do_cfg)
        n_steps = timesteps.shape[0]

        def step_fn(carry, scan_in):
            i, t = scan_in
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = unet(
                unet_params, latent_input,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds,
            ).sample
            cond_input = scheduler.scale_model_input(sstate, latents, t)
            noise_perturb = self._pag_cond_forward(
                unet, unet_params, cond_input,
                jnp.broadcast_to(t, (cond_input.shape[0],)), cond_embeds,
            )
            pred = self._pag_combine(noise_pred, noise_perturb, i, n_steps, guidance_scale, do_cfg)
            out = scheduler.step(sstate, pred, t, latents)
            return (out.prev_sample, out.state), None

        steps = jnp.arange(n_steps, dtype=jnp.float32)
        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (steps, timesteps))
        return latents
