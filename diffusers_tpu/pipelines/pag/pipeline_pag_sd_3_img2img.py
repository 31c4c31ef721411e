"""Stable Diffusion 3 image-to-image with Perturbed Attention Guidance.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/pag/pipeline_pag_sd_3_img2img.py`):
strength-truncated flow-match schedule from the VAE-encoded init image with
the PAG perturbed conditional on the selected MMDiT blocks (`pag_utils.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...guiders.perturbed_attention_guidance import pag_perturbed
from ...utils import logging
from ..stable_diffusion_3.pipeline_stable_diffusion_3_img2img import StableDiffusion3Img2ImgPipeline
from .pag_utils import PAGMixin

logger = logging.get_logger(__name__)


class StableDiffusion3PAGImg2ImgPipeline(PAGMixin, StableDiffusion3Img2ImgPipeline):
    def __call__(self, *args, pag_applied_layers=r"transformer_blocks\.13", **kwargs):
        # SD3's reference default perturbs block 13 (pipeline_pag_sd_3_img2img.py)
        return super().__call__(*args, pag_applied_layers=pag_applied_layers, **kwargs)

    def _denoise(self, t_params, latents, prompt_embeds, pooled, timesteps, state, guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        b = latents.shape[0]
        cond_embeds = self._cond_half(prompt_embeds, do_cfg)
        cond_pooled = self._cond_half(pooled, do_cfg)
        n_steps = timesteps.shape[0]

        def step_fn(carry, scan_in):
            i, t = scan_in
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            noise_pred = transformer(
                t_params, latent_input, prompt_embeds, pooled,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
            ).sample
            with pag_perturbed(self._pag_layers):
                noise_perturb = transformer(
                    t_params, latents, cond_embeds, cond_pooled,
                    jnp.broadcast_to(t, (b,)),
                ).sample
            pred = self._pag_combine(noise_pred, noise_perturb, i, n_steps, guidance_scale, do_cfg)
            out = scheduler.step(sstate, pred, t, latents)
            return (out.prev_sample, out.state), None

        steps = jnp.arange(n_steps, dtype=jnp.float32)
        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (steps, timesteps))
        return latents
