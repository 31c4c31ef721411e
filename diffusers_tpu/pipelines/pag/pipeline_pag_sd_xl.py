"""SDXL with Perturbed Attention Guidance.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/pag/pipeline_pag_sd_xl.py`). Same
TPU-first shape as StableDiffusionPAGPipeline: the perturbed conditional is a
second traced forward with the identity-self-attention flag flipped at trace
time; all three predictions live in one jitted `lax.scan` step.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...guiders.perturbed_attention_guidance import pag_perturbed, select_pag_layers
from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ..stable_diffusion_xl.pipeline_stable_diffusion_xl import (
    StableDiffusionXLPipeline,
    StableDiffusionXLPipelineOutput,
)

logger = logging.get_logger(__name__)


class StableDiffusionXLPAGPipeline(StableDiffusionXLPipeline):
    def _denoise_pag(self, unet_params, prompt_embeds, add_text_embeds, add_time_ids, latents,
                     guidance_scale, pag_scale, pag_start, pag_stop, num_inference_steps,
                     do_cfg, pag_layers):
        unet = self.unet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)
        b = latents.shape[0]
        cond_embeds = prompt_embeds[b:] if do_cfg else prompt_embeds
        cond_text = add_text_embeds[b:] if do_cfg else add_text_embeds
        cond_time = add_time_ids[b:] if do_cfg else add_time_ids

        def step_fn(carry, scan_in):
            i, t = scan_in
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = unet(
                unet_params, latent_input,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds,
                added_cond_kwargs={"text_embeds": add_text_embeds, "time_ids": add_time_ids},
            ).sample

            cond_input = scheduler.scale_model_input(sstate, latents, t)
            with pag_perturbed(pag_layers):
                noise_perturb = unet(
                    unet_params, cond_input,
                    jnp.broadcast_to(t, (cond_input.shape[0],)),
                    encoder_hidden_states=cond_embeds,
                    added_cond_kwargs={"text_embeds": cond_text, "time_ids": cond_time},
                ).sample

            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                pred = uncond + guidance_scale * (cond - uncond)
            else:
                cond = noise_pred
                pred = cond
            frac = i / jnp.maximum(num_inference_steps, 1)
            pag_on = (frac >= pag_start) & (frac < pag_stop)
            pred = pred + jnp.where(pag_on, pag_scale, 0.0) * (cond - noise_perturb)

            out = scheduler.step(sstate, pred, t, latents)
            return (out.prev_sample, out.state), None

        steps = jnp.arange(state.timesteps.shape[0], dtype=jnp.float32)
        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (steps, state.timesteps))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        prompt_2: Optional[Union[str, List[str]]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        pag_scale: float = 3.0,
        pag_applied_layers: Union[str, List[str]] = "mid",
        pag_start: float = 0.0,
        pag_stop: float = 1.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        negative_prompt_2: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        original_size = original_size or (height, width)
        target_size = target_size or (height, width)
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds, pooled, negative_pooled = self.encode_prompt(
            prompt, prompt_2, negative_prompt, negative_prompt_2, do_cfg
        )
        batch_size = prompt_embeds.shape[0]
        add_time_ids = self._get_add_time_ids(original_size, crops_coords_top_left, target_size, batch_size)
        if do_cfg:
            prompt_embeds = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)
            add_text_embeds = jnp.concatenate([negative_pooled, pooled], axis=0)
            add_time_ids = jnp.concatenate([add_time_ids, add_time_ids], axis=0)
        else:
            add_text_embeds = pooled

        shape = (batch_size, unet.config.in_channels, height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            latents = randn_tensor(shape, key=key)

        pag_layers = select_pag_layers(unet, pag_applied_layers)
        denoise = self._jit(
            "denoise_pag",
            partial(self._denoise_pag, guidance_scale=guidance_scale, pag_scale=pag_scale,
                    pag_start=pag_start, pag_stop=pag_stop,
                    num_inference_steps=num_inference_steps, do_cfg=do_cfg, pag_layers=pag_layers),
            static=(guidance_scale, pag_scale, pag_start, pag_stop, num_inference_steps, do_cfg,
                    tuple(pag_applied_layers) if isinstance(pag_applied_layers, list) else pag_applied_layers),
        )
        latents = denoise(unet_params, prompt_embeds, add_text_embeds, add_time_ids, latents)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image = self.image_processor.postprocess(decode(vae_params, latents), output_type=output_type)

        if not return_dict:
            return (image,)
        return StableDiffusionXLPipelineOutput(images=image)
