"""Latent Diffusion 4x super-resolution pipeline.

Behavioral mirror of the reference
`pipelines/latent_diffusion/pipeline_latent_diffusion_superresolution.py:39`:
the low-res image rides along in pixel space — latents and image are
channel-concatenated each step (unet in_channels = 2 * latent channels),
denoised with any discrete scheduler, and decoded by the VQ-VAE with a
[-1, 1] clamp.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline


@dataclass
class ImagePipelineOutput(BaseOutput):
    images: np.ndarray


class LDMSuperResolutionPipeline(DiffusionPipeline):
    def __init__(self, vqvae, unet, scheduler):
        super().__init__()
        self.register_modules(vqvae=vqvae, unet=unet, scheduler=scheduler)

    def _denoise(self, params, latents, image, state, eta, key):
        unet, scheduler = self.unet[0], self.scheduler
        step_keys = jax.random.split(key, state.timesteps.shape[0])
        sig = inspect.signature(scheduler.step).parameters
        accepts_eta, accepts_key = "eta" in sig, "key" in sig

        def step_fn(carry, xs):
            latents, sstate = carry
            t, k = xs
            latents_input = jnp.concatenate([latents, image], axis=1)
            if hasattr(scheduler, "scale_model_input"):
                latents_input = scheduler.scale_model_input(sstate, latents_input, t)
            noise_pred = unet(params, latents_input, t).sample
            kwargs = {}
            if accepts_eta:
                kwargs["eta"] = eta
            if accepts_key:
                kwargs["key"] = k
            out = scheduler.step(sstate, noise_pred, t, latents, **kwargs)
            new_state = out.state if getattr(out, "state", None) is not None else sstate
            return (out.prev_sample, new_state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (state.timesteps, step_keys))
        return latents

    def __call__(
        self,
        image: Union[jax.Array, np.ndarray] = None,
        batch_size: int = 1,
        num_inference_steps: int = 100,
        eta: float = 0.0,
        key: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vqvae, vq_params = self.vqvae
        if key is None:
            key = jax.random.PRNGKey(0)

        if hasattr(image, "size") and not hasattr(image, "shape"):  # PIL
            w, h = (x - x % 32 for x in image.size)
            image = image.resize((w, h))
            image = np.asarray(image).astype(np.float32) / 255.0
            image = image[None].transpose(0, 3, 1, 2) * 2.0 - 1.0
        image = jnp.asarray(image)
        batch_size = image.shape[0]
        height, width = image.shape[-2:]

        latents_shape = (batch_size, unet.config.in_channels // 2, height, width)
        key, lat_key, step_key = jax.random.split(key, 3)
        latents = randn_tensor(latents_shape, key=lat_key)

        state = self.scheduler.set_timesteps(num_inference_steps)
        if hasattr(state, "init_noise_sigma"):
            latents = latents * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, latents)

        denoise = self._jit(
            "denoise", partial(self._denoise, eta=eta), static=(eta, num_inference_steps)
        )
        latents = denoise(unet_params, latents, image.astype(latents.dtype), state, key=step_key)

        decoded = self._jit("decode", lambda p, z: vqvae.decode(p, z).sample)(vq_params, latents)
        out = np.asarray(jnp.transpose(jnp.clip(decoded, -1.0, 1.0) / 2 + 0.5, (0, 2, 3, 1)))

        if output_type == "pil":
            from ...image_processor import numpy_to_pil

            out = numpy_to_pil(out)
        if not return_dict:
            return (out,)
        return ImagePipelineOutput(images=out)
