"""Latent Consistency Model text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/latent_consistency_models/pipeline_latent_consistency_text2img.py`):
no classifier-free guidance — the guidance scale enters as a sinusoidal
`w`-embedding through the UNet's `time_cond_proj_dim` conditioning; each step
threads `(latents, denoised)` through the LCM scheduler, and the final image
decodes the last `denoised` (not the noisy latents). Whole loop is one
`lax.scan`, with the per-step PRNG key folded from a scanned counter.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ..stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipeline, StableDiffusionPipelineOutput

logger = logging.get_logger(__name__)


def get_guidance_scale_embedding(w: jax.Array, embedding_dim: int = 512) -> jax.Array:
    """Sinusoidal embedding of (guidance_scale − 1)·1000 (VDM-style;
    reference pipeline `:517`)."""
    w = w * 1000.0
    half_dim = embedding_dim // 2
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * (-np.log(10000.0) / (half_dim - 1)))
    emb = w[:, None].astype(jnp.float32) * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class LatentConsistencyModelPipeline(StableDiffusionPipeline):
    def _denoise_lcm(self, unet_params, prompt_embeds, latents, w_embedding, num_inference_steps, key):
        unet = self.unet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma

        def step_fn(carry, scan_in):
            i, t = scan_in
            latents, denoised, sstate = carry
            noise_pred = unet(
                unet_params,
                latents,
                jnp.broadcast_to(t, (latents.shape[0],)),
                encoder_hidden_states=prompt_embeds,
                timestep_cond=w_embedding,
            ).sample
            step_key = jax.random.fold_in(key, i)
            out = scheduler.step(sstate, noise_pred, t, latents, key=step_key)
            return (out.prev_sample, out.denoised, out.state if out.state is not None else sstate), None

        steps = jnp.arange(state.timesteps.shape[0])
        (latents, denoised, _), _ = jax.lax.scan(
            step_fn, (latents, jnp.zeros_like(latents), state), (steps, state.timesteps)
        )
        return denoised

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 4,
        guidance_scale: float = 8.5,
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

        # LCM guidance embedding: w = guidance_scale − 1 (reference `:868`)
        w = jnp.full((batch_size,), guidance_scale - 1.0, dtype=jnp.float32)
        cond_dim = unet.config.get("time_cond_proj_dim") or 256
        w_embedding = get_guidance_scale_embedding(w, cond_dim)

        denoise = self._jit("denoise", partial(self._denoise_lcm, num_inference_steps=num_inference_steps),
                            static=(num_inference_steps,))
        denoised = denoise(unet_params, prompt_embeds, latents, w_embedding, key=noise_key)

        if output_type == "latent":
            image = denoised
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, denoised)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return StableDiffusionPipelineOutput(images=image)
