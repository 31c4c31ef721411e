"""AnimateDiff text-to-video with Perturbed Attention Guidance.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/pag/pipeline_pag_sd_animatediff.py`):
PAG identity self-attention in the motion UNet's selected spatial layers,
perturbed conditional in-scan (`pag_utils.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils import logging
from ..animatediff.pipeline_animatediff import AnimateDiffPipeline
from .pag_utils import PAGMixin

logger = logging.get_logger(__name__)


class AnimateDiffPAGPipeline(PAGMixin, AnimateDiffPipeline):
    def _denoise(self, unet_params, prompt_embeds, latents, guidance_scale, num_inference_steps,
                 do_cfg, image_embeds=None):
        unet = self.unet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)
        added_cond_kwargs = {"image_embeds": image_embeds} if image_embeds is not None else None
        # prompt embeds are frame-repeated [(2)B*F, S, D]
        cond_embeds = self._cond_half(prompt_embeds, do_cfg)
        cond_added = self._cond_half(added_cond_kwargs, do_cfg) if added_cond_kwargs else None

        def step_fn(carry, scan_in):
            i, t = scan_in
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = unet(
                unet_params, latent_input, t,
                encoder_hidden_states=prompt_embeds,
                added_cond_kwargs=added_cond_kwargs,
            ).sample
            cond_input = scheduler.scale_model_input(sstate, latents, t)
            noise_perturb = self._pag_cond_forward(
                unet, unet_params, cond_input, t, cond_embeds,
                added_cond_kwargs=cond_added,
            )
            pred = self._pag_combine(noise_pred, noise_perturb, i, num_inference_steps, guidance_scale, do_cfg)
            out = scheduler.step(sstate, pred, t, latents)
            return (out.prev_sample, out.state), None

        steps = jnp.arange(state.timesteps.shape[0], dtype=jnp.float32)
        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (steps, state.timesteps))
        return latents
