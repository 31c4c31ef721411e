"""Trajectory Consistency Distillation text-to-image pipeline.

Behavioral mirror of the reference TCD recipe (the reference ships TCD through
its LCM-style pipelines + `scheduling_tcd.py`; community pipeline
`pipeline_tcd.py`): no CFG — guidance enters as the LCM `w`-embedding — and
each step uses the TCD stochastic step with strategic parameter `gamma`
(eta). One `lax.scan`, per-step keys folded from a scanned counter.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ..latent_consistency_models.pipeline_latent_consistency_text2img import get_guidance_scale_embedding
from ..stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipeline, StableDiffusionPipelineOutput

logger = logging.get_logger(__name__)


class TCDPipeline(StableDiffusionPipeline):
    def _denoise_tcd(self, unet_params, prompt_embeds, latents, w_embedding, num_inference_steps, eta, key):
        unet = self.unet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma

        def step_fn(carry, scan_in):
            i, t = scan_in
            latents, sstate = carry
            noise_pred = unet(
                unet_params,
                latents,
                jnp.broadcast_to(t, (latents.shape[0],)),
                encoder_hidden_states=prompt_embeds,
                timestep_cond=w_embedding,
            ).sample
            step_key = jax.random.fold_in(key, i)
            out = scheduler.step(sstate, noise_pred, t, latents, eta=eta, key=step_key)
            return (out.prev_sample, out.state if out.state is not None else sstate), None

        steps = jnp.arange(state.timesteps.shape[0])
        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (steps, state.timesteps))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 4,
        guidance_scale: float = 0.0,
        eta: float = 0.3,  # TCD "gamma": 0 = deterministic, 1 = full stochastic
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        height = height or unet.config.sample_size * self.vae_scale_factor
        width = width or unet.config.sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)

        if prompt_embeds is None:
            prompt_embeds = self.encode_prompt(prompt, negative_prompt=None, do_classifier_free_guidance=False)
        batch_size = prompt_embeds.shape[0] * num_images_per_prompt
        if num_images_per_prompt != 1:
            prompt_embeds = jnp.repeat(prompt_embeds, num_images_per_prompt, axis=0)

        shape = (batch_size, unet.config.in_channels, height // self.vae_scale_factor, width // self.vae_scale_factor)
        key, latent_key, noise_key = jax.random.split(key, 3)
        if latents is None:
            latents = randn_tensor(shape, key=latent_key)

        w_embedding = None
        if unet.config.get("time_cond_proj_dim") is not None:
            w = jnp.full((batch_size,), guidance_scale - 1.0, dtype=jnp.float32)
            w_embedding = get_guidance_scale_embedding(w, unet.config.time_cond_proj_dim)

        denoise = self._jit("denoise", partial(self._denoise_tcd, num_inference_steps=num_inference_steps, eta=eta),
                            static=(num_inference_steps, eta))
        latents = denoise(unet_params, prompt_embeds, latents, w_embedding, key=noise_key)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return StableDiffusionPipelineOutput(images=image)
