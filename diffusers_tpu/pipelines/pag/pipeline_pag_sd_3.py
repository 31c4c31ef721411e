"""Stable Diffusion 3 with Perturbed Attention Guidance.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/pag/pipeline_pag_sd_3.py`): the
perturbed conditional forward masks image↔image joint attention to identity
(JointAttention.pag_identity — reference PAGJointAttnProcessor2_0,
`attention_processor.py:1508`) in the selected transformer blocks.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...guiders.perturbed_attention_guidance import pag_perturbed, select_pag_layers
from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ..stable_diffusion_3.pipeline_stable_diffusion_3 import (
    StableDiffusion3Pipeline,
    StableDiffusion3PipelineOutput,
)

logger = logging.get_logger(__name__)


class StableDiffusion3PAGPipeline(StableDiffusion3Pipeline):
    def _denoise_pag(self, t_params, latents, prompt_embeds, pooled, timesteps, state,
                     guidance_scale, pag_scale, pag_start, pag_stop, do_cfg, pag_layers):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        b = latents.shape[0]
        cond_embeds = prompt_embeds[b:] if do_cfg else prompt_embeds
        cond_pooled = pooled[b:] if do_cfg else pooled
        num_steps = timesteps.shape[0]

        def step_fn(carry, scan_in):
            i, t = scan_in
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            noise_pred = transformer(
                t_params, latent_input, prompt_embeds, pooled,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
            ).sample

            with pag_perturbed(pag_layers):
                noise_perturb = transformer(
                    t_params, latents, cond_embeds, cond_pooled,
                    jnp.broadcast_to(t, (b,)),
                ).sample

            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                pred = uncond + guidance_scale * (cond - uncond)
            else:
                cond = noise_pred
                pred = cond
            frac = i / jnp.maximum(num_steps, 1)
            pag_on = (frac >= pag_start) & (frac < pag_stop)
            pred = pred + jnp.where(pag_on, pag_scale, 0.0) * (cond - noise_perturb)

            out = scheduler.step(sstate, pred, t, latents)
            return (out.prev_sample, out.state), None

        steps = jnp.arange(num_steps, dtype=jnp.float32)
        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (steps, timesteps))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 28,
        guidance_scale: float = 7.0,
        pag_scale: float = 3.0,
        pag_applied_layers: Union[str, List[str]] = r"transformer_blocks\.13",
        pag_start: float = 0.0,
        pag_stop: float = 1.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 256,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, neg_embeds, pooled, neg_pooled = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length
        )
        batch_size = prompt_embeds.shape[0]
        if do_cfg:
            prompt_embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            pooled = jnp.concatenate([neg_pooled, pooled], axis=0)

        shape = (batch_size, transformer.config.in_channels,
                 height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            latents = randn_tensor(shape, key=key)

        state = self.scheduler.set_timesteps(num_inference_steps)
        pag_layers = select_pag_layers(transformer, pag_applied_layers)
        denoise = self._jit(
            "denoise_pag",
            partial(self._denoise_pag, guidance_scale=guidance_scale, pag_scale=pag_scale,
                    pag_start=pag_start, pag_stop=pag_stop, do_cfg=do_cfg, pag_layers=pag_layers),
            static=(guidance_scale, pag_scale, pag_start, pag_stop, do_cfg,
                    tuple(pag_applied_layers) if isinstance(pag_applied_layers, list) else pag_applied_layers),
        )
        latents = denoise(t_params, latents, prompt_embeds, pooled, state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            def decode(p, z):
                z = z / vae.config.scaling_factor
                if vae.config.get("shift_factor") is not None:
                    z = z + vae.config.shift_factor
                return vae.decode(p, z).sample

            image = self._jit("decode", decode)(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return StableDiffusion3PipelineOutput(images=image)
