"""HunyuanDiT text-to-image with Perturbed Attention Guidance.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/pag/pipeline_pag_hunyuandit.py`):
PAG identity self-attention on the selected `blocks.{k}.attn1` layers, the
perturbed conditional traced inside the scanned denoise step (`pag_utils.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils import logging
from ..hunyuandit.pipeline_hunyuandit import HunyuanDiTPipeline
from .pag_utils import PAGMixin

logger = logging.get_logger(__name__)


class HunyuanDiTPAGPipeline(PAGMixin, HunyuanDiTPipeline):
    def _denoise(self, t_params, latents, embeds, mask, t5_embeds, t5_mask, add_time_ids, style,
                 rope_cos, rope_sin, timesteps, state, guidance_scale, guidance_rescale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        n_steps = timesteps.shape[0]
        cond = lambda x: self._cond_half(x, do_cfg)

        def step_fn(carry, scan_in):
            i, t = scan_in
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            t_expand = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = transformer(
                t_params, latent_input, t_expand,
                encoder_hidden_states=embeds,
                text_embedding_mask=mask,
                encoder_hidden_states_t5=t5_embeds,
                text_embedding_mask_t5=t5_mask,
                image_meta_size=add_time_ids,
                style=style,
                image_rotary_emb=(rope_cos, rope_sin),
            ).sample
            noise_pred, _ = jnp.split(noise_pred, 2, axis=1)

            cond_input = scheduler.scale_model_input(sstate, latents, t)
            t_cond = jnp.broadcast_to(t, (cond_input.shape[0],))
            from ...guiders.perturbed_attention_guidance import pag_perturbed

            with pag_perturbed(self._pag_layers):
                noise_perturb = transformer(
                    t_params, cond_input, t_cond,
                    encoder_hidden_states=cond(embeds),
                    text_embedding_mask=cond(mask),
                    encoder_hidden_states_t5=cond(t5_embeds),
                    text_embedding_mask_t5=cond(t5_mask),
                    image_meta_size=cond(add_time_ids),
                    style=cond(style),
                    image_rotary_emb=(rope_cos, rope_sin),
                ).sample
            noise_perturb, _ = jnp.split(noise_perturb, 2, axis=1)

            pred = self._pag_combine(noise_pred, noise_perturb, i, n_steps, guidance_scale, do_cfg)
            if do_cfg and guidance_rescale > 0:
                _, text = jnp.split(noise_pred, 2, axis=0)
                std_text = jnp.std(text, axis=tuple(range(1, text.ndim)), keepdims=True)
                std_cfg = jnp.std(pred, axis=tuple(range(1, pred.ndim)), keepdims=True)
                pred = guidance_rescale * (pred * std_text / std_cfg) + (1 - guidance_rescale) * pred
            out = scheduler.step(sstate, pred, t, latents)
            return (out.prev_sample, out.state), None

        steps = jnp.arange(n_steps, dtype=jnp.float32)
        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (steps, timesteps))
        return latents
