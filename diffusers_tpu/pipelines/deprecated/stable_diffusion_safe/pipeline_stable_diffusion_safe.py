"""Safe Latent Diffusion (SLD) pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/stable_diffusion_safe/pipeline_stable_diffusion_safe.py:60`):
a third, safety-concept conditioned UNet stream steers the CFG direction away
from unsafe content (SLD Eq. 3-8, arXiv:2211.05105) with a momentum term
warmed up over `sld_warmup_steps`.

TPU-native: the [uncond | text | safety] triple runs as ONE batch-3B forward
inside a single lax.scan; the momentum is a scan carry and the warmup gate is
`step_index >= warmup` on the scan counter (no host branching).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ....utils.jax_utils import randn_tensor
from ...stable_diffusion.pipeline_stable_diffusion import (
    StableDiffusionPipeline,
    StableDiffusionPipelineOutput,
)

DEFAULT_SAFETY_CONCEPT = (
    "an image showing hate, harassment, violence, suffering, humiliation, harm, suicide, sexual,"
    " nudity, bodily fluids, blood, obscene gestures, illegal activity, drug use, theft,"
    " vandalism, weapons, child abuse, brutality, cruelty"
)


class SafetyConfig:
    """Reference `pipeline_stable_diffusion_safe.py` SafetyConfig presets."""

    WEAK = dict(sld_warmup_steps=15, sld_guidance_scale=20, sld_threshold=0.0,
                sld_momentum_scale=0.0, sld_mom_beta=0.0)
    MEDIUM = dict(sld_warmup_steps=10, sld_guidance_scale=1000, sld_threshold=0.01,
                  sld_momentum_scale=0.3, sld_mom_beta=0.4)
    STRONG = dict(sld_warmup_steps=7, sld_guidance_scale=2000, sld_threshold=0.025,
                  sld_momentum_scale=0.5, sld_mom_beta=0.7)
    MAX = dict(sld_warmup_steps=0, sld_guidance_scale=5000, sld_threshold=1.0,
               sld_momentum_scale=0.5, sld_mom_beta=0.7)


class StableDiffusionPipelineSafe(StableDiffusionPipeline):
    _safety_text_concept = DEFAULT_SAFETY_CONCEPT

    @property
    def safety_concept(self):
        return self._safety_text_concept

    @safety_concept.setter
    def safety_concept(self, concept):
        self._safety_text_concept = concept

    def _denoise_sld(self, unet_params, prompt_embeds, latents, guidance_scale,
                     num_inference_steps, enable_safety, sld_guidance_scale,
                     sld_warmup_steps, sld_threshold, sld_momentum_scale, sld_mom_beta):
        unet = self.unet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)
        streams = 3 if enable_safety else 2

        def step_fn(carry, xs):
            latents, sstate, momentum = carry
            i, t = xs
            latent_input = jnp.concatenate([latents] * streams, axis=0)
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            t_b = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = unet(unet_params, latent_input, t_b, encoder_hidden_states=prompt_embeds).sample
            parts = jnp.split(noise_pred, streams, axis=0)
            uncond, text = parts[0], parts[1]
            noise_guidance = text - uncond
            if enable_safety:
                safety = parts[2]
                # Eq. 6: elementwise gate on where the text direction already
                # diverges from the unsafe concept
                scale = jnp.minimum(jnp.abs(text - safety) * sld_guidance_scale, 1.0)
                concept_scale = jnp.where(text - safety >= sld_threshold, 0.0, scale)
                # Eq. 4 + 7 + 8
                guidance_safety = (safety - uncond) * concept_scale
                guidance_safety = guidance_safety + sld_momentum_scale * momentum
                momentum = sld_mom_beta * momentum + (1 - sld_mom_beta) * guidance_safety
                # Eq. 3, gated by warmup on the scan counter
                noise_guidance = jnp.where(i >= sld_warmup_steps,
                                           noise_guidance - guidance_safety, noise_guidance)
            noise_pred = uncond + guidance_scale * noise_guidance
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state, momentum), None

        momentum0 = jnp.zeros_like(latents)
        (latents, _, _), _ = jax.lax.scan(
            step_fn, (latents, state, momentum0),
            (jnp.arange(len(state.timesteps)), state.timesteps))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        sld_guidance_scale: float = 1000.0,
        sld_warmup_steps: int = 10,
        sld_threshold: float = 0.01,
        sld_momentum_scale: float = 0.3,
        sld_mom_beta: float = 0.4,
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
        enable_safety = sld_guidance_scale > 1.0 and do_cfg
        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)
        if enable_safety:
            # third stream conditioned on the safety concept (reference `:297`)
            safety_embeds = self.encode_prompt(
                [self._safety_text_concept] * batch_size, None, False)
            prompt_embeds = jnp.concatenate([prompt_embeds, safety_embeds], axis=0)

        shape = (batch_size, unet.config.in_channels,
                 height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            latents = randn_tensor(shape, key=key)

        if not do_cfg:
            return super().__call__(
                prompt=prompt, height=height, width=width,
                num_inference_steps=num_inference_steps, guidance_scale=guidance_scale,
                key=key, latents=latents, output_type=output_type, return_dict=return_dict)

        denoise = self._jit(
            "denoise_sld",
            partial(self._denoise_sld, guidance_scale=guidance_scale,
                    num_inference_steps=num_inference_steps, enable_safety=enable_safety,
                    sld_guidance_scale=float(sld_guidance_scale),
                    sld_warmup_steps=int(sld_warmup_steps), sld_threshold=float(sld_threshold),
                    sld_momentum_scale=float(sld_momentum_scale), sld_mom_beta=float(sld_mom_beta)),
            static=(guidance_scale, num_inference_steps, enable_safety,
                    float(sld_guidance_scale), int(sld_warmup_steps), float(sld_threshold),
                    float(sld_momentum_scale), float(sld_mom_beta)),
        )
        latents = denoise(unet_params, prompt_embeds, latents)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)
        if not return_dict:
            return (image, None)
        return StableDiffusionPipelineOutput(images=image)
