"""Unconditional latent diffusion (LDM + VQ-VAE decode).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/latent_diffusion_uncond/pipeline_latent_diffusion_uncond.py`
LDMPipeline): DDIM-denoise a latent, divide by the VQ scaling factor, decode.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....utils import BaseOutput
from ....utils.jax_utils import randn_tensor
from ...pipeline_utils import DiffusionPipeline


@dataclass
class ImagePipelineOutput(BaseOutput):
    images: np.ndarray


class LDMPipeline(DiffusionPipeline):
    def __init__(self, vqvae, unet, scheduler):
        super().__init__()
        self.register_modules(vqvae=vqvae, unet=unet, scheduler=scheduler)

    def _generate(self, unet_params, vq_params, key, batch_size, num_inference_steps, eta):
        model, scheduler = self.unet[0], self.scheduler
        vqvae = self.vqvae[0]
        ss = model.config.sample_size
        state = scheduler.set_timesteps(num_inference_steps)
        key, init_key = jax.random.split(key)
        latents = randn_tensor((batch_size, model.config.in_channels, ss, ss), key=init_key)
        latents = latents * getattr(scheduler, "init_noise_sigma", 1.0)
        step_keys = jax.random.split(key, state.timesteps.shape[0])

        def step_fn(carry, xs):
            lat, sstate = carry
            t, k = xs
            lat_in = scheduler.scale_model_input(sstate, lat, t)
            pred = model(unet_params, lat_in, t).sample
            try:
                out = scheduler.step(sstate, pred, t, lat, eta=eta, key=k)
            except TypeError:
                out = scheduler.step(sstate, pred, t, lat)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (state.timesteps, step_keys))
        latents = latents / vqvae.config.get("scaling_factor", 1.0)
        image = vqvae.decode(vq_params, latents).sample
        return jnp.transpose(jnp.clip(image / 2 + 0.5, 0, 1), (0, 2, 3, 1))

    def __call__(self, batch_size: int = 1, num_inference_steps: int = 50, eta: float = 0.0,
                 key: Optional[jax.Array] = None, output_type: str = "pil",
                 return_dict: bool = True):
        if key is None:
            key = jax.random.PRNGKey(0)
        generate = self._jit(
            "generate",
            partial(self._generate, batch_size=batch_size,
                    num_inference_steps=num_inference_steps, eta=float(eta)),
            static=(batch_size, num_inference_steps, float(eta)))
        image = np.asarray(generate(self.unet[1], self.vqvae[1], key))
        if output_type == "pil":
            from ....image_processor import VaeImageProcessor
            image = VaeImageProcessor.numpy_to_pil(image)
        if not return_dict:
            return (image,)
        return ImagePipelineOutput(images=image)
