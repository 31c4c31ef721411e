"""Sana text-to-image with Perturbed Attention Guidance.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/pag/pipeline_pag_sana.py`): PAG
identity on the selected linear self-attention layers
(`transformer_blocks.{k}.attn1`), perturbed conditional in-scan
(`pag_utils.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...guiders.perturbed_attention_guidance import pag_perturbed
from ...utils import logging
from ..sana.pipeline_sana import SanaPipeline
from .pag_utils import PAGMixin

logger = logging.get_logger(__name__)


class SanaPAGPipeline(PAGMixin, SanaPipeline):
    def _denoise(self, transformer_params, prompt_embeds, prompt_attention_mask, latents,
                 guidance_scale, num_inference_steps, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)
        ts_scale = transformer.config.get("timestep_scale", 1.0)
        cond_embeds = self._cond_half(prompt_embeds, do_cfg)
        cond_mask = self._cond_half(prompt_attention_mask, do_cfg)
        learn_sigma = transformer.config.out_channels // 2 == latents.shape[1]

        def step_fn(carry, scan_in):
            i, t = scan_in
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            timestep = jnp.broadcast_to(t, (latent_input.shape[0],)).astype(jnp.float32) * ts_scale
            noise_pred = transformer(
                transformer_params, latent_input,
                encoder_hidden_states=prompt_embeds,
                timestep=timestep,
                encoder_attention_mask=prompt_attention_mask,
            ).sample.astype(jnp.float32)

            cond_input = scheduler.scale_model_input(sstate, latents, t)
            t_cond = jnp.broadcast_to(t, (cond_input.shape[0],)).astype(jnp.float32) * ts_scale
            with pag_perturbed(self._pag_layers):
                noise_perturb = transformer(
                    transformer_params, cond_input,
                    encoder_hidden_states=cond_embeds,
                    timestep=t_cond,
                    encoder_attention_mask=cond_mask,
                ).sample.astype(jnp.float32)

            if learn_sigma:
                noise_pred = jnp.split(noise_pred, 2, axis=1)[0]
                noise_perturb = jnp.split(noise_perturb, 2, axis=1)[0]
            pred = self._pag_combine(noise_pred, noise_perturb, i, num_inference_steps, guidance_scale, do_cfg)
            out = scheduler.step(sstate, pred, t, latents)
            return (out.prev_sample, out.state), None

        steps = jnp.arange(state.timesteps.shape[0], dtype=jnp.float32)
        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (steps, state.timesteps))
        return latents
