"""Stable Diffusion with Perturbed Attention Guidance.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/pag/pipeline_pag_sd.py`). TPU-first
shape: the reference triples the batch (uncond/cond/perturbed share one
forward through processor-swapped modules); here the perturbed conditional is
its own traced forward with the identity-attention flag flipped at trace time
— the three predictions still live in one jitted `lax.scan` step, and XLA
schedules both UNet calls back to back with zero host sync.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...guiders.perturbed_attention_guidance import pag_perturbed, select_pag_layers
from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ..stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipeline, StableDiffusionPipelineOutput

logger = logging.get_logger(__name__)


class StableDiffusionPAGPipeline(StableDiffusionPipeline):
    def _denoise_pag(
        self, unet_params, prompt_embeds, latents, guidance_scale, pag_scale,
        pag_start, pag_stop, num_inference_steps, do_cfg, pag_layers,
    ):
        unet = self.unet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)
        cond_embeds = prompt_embeds[latents.shape[0]:] if do_cfg else prompt_embeds

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

            # perturbed conditional forward (identity self-attn in pag_layers)
            cond_input = scheduler.scale_model_input(sstate, latents, t)
            with pag_perturbed(pag_layers):
                noise_perturb = unet(
                    unet_params, cond_input,
                    jnp.broadcast_to(t, (cond_input.shape[0],)),
                    encoder_hidden_states=cond_embeds,
                ).sample

            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
            else:
                uncond, cond = None, noise_pred

            pred = cond if uncond is None else uncond + guidance_scale * (cond - uncond)
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
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        pag_scale: float = 3.0,
        pag_applied_layers: Union[str, List[str]] = "mid",
        pag_start: float = 0.0,
        pag_stop: float = 1.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        height = height or unet.config.sample_size * self.vae_scale_factor
        width = width or unet.config.sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        shape = (batch_size, unet.config.in_channels, height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            latents = randn_tensor(shape, key=key)

        pag_layers = select_pag_layers(unet, pag_applied_layers)
        denoise = self._jit(
            "denoise",
            partial(
                self._denoise_pag,
                guidance_scale=guidance_scale,
                pag_scale=pag_scale,
                pag_start=pag_start,
                pag_stop=pag_stop,
                num_inference_steps=num_inference_steps,
                do_cfg=do_cfg,
                pag_layers=tuple(pag_layers),
            ),
            static=(guidance_scale, pag_scale, pag_start, pag_stop, num_inference_steps, do_cfg, tuple(pag_layers)),
        )
        latents = denoise(unet_params, prompt_embeds, latents)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return StableDiffusionPipelineOutput(images=image)
