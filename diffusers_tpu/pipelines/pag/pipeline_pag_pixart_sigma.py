"""PixArt-Sigma text-to-image with Perturbed Attention Guidance.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/pag/pipeline_pag_pixart_sigma.py`):
PAG identity on the selected `transformer_blocks.{k}.attn1` layers, the
perturbed conditional traced inside the scanned denoise step (`pag_utils.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...guiders.perturbed_attention_guidance import pag_perturbed
from ...utils import logging
from ..pixart_alpha.pipeline_pixart_alpha import PixArtSigmaPipeline
from .pag_utils import PAGMixin

logger = logging.get_logger(__name__)


class PixArtSigmaPAGPipeline(PAGMixin, PixArtSigmaPipeline):
    def _denoise(self, t_params, latents, prompt_embeds, prompt_mask, added_cond,
                 timesteps, state, guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        latent_channels = latents.shape[1]
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)
        n_steps = timesteps.shape[0]
        cond_embeds = self._cond_half(prompt_embeds, do_cfg)
        cond_mask = self._cond_half(prompt_mask, do_cfg)
        cond_added = self._cond_half(added_cond, do_cfg) if added_cond else added_cond

        def step_fn(carry, scan_in):
            i, t = scan_in
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t) if hasattr(
                scheduler, "scale_model_input") else latent_input
            timestep = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = transformer(
                t_params, latent_input, prompt_embeds, timestep,
                added_cond_kwargs=added_cond, encoder_attention_mask=prompt_mask,
            ).sample

            cond_input = scheduler.scale_model_input(sstate, latents, t) if hasattr(
                scheduler, "scale_model_input") else latents
            t_c = jnp.broadcast_to(t, (cond_input.shape[0],))
            with pag_perturbed(self._pag_layers):
                noise_perturb = transformer(
                    t_params, cond_input, cond_embeds, t_c,
                    added_cond_kwargs=cond_added, encoder_attention_mask=cond_mask,
                ).sample

            if noise_pred.shape[1] == 2 * latent_channels:
                noise_pred = noise_pred[:, :latent_channels]
                noise_perturb = noise_perturb[:, :latent_channels]
            pred = self._pag_combine(noise_pred, noise_perturb, i, n_steps, guidance_scale, do_cfg)
            out = scheduler.step(sstate, pred, t, latents)
            return (out.prev_sample, out.state), None

        steps = jnp.arange(n_steps, dtype=jnp.float32)
        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (steps, timesteps))
        return latents
