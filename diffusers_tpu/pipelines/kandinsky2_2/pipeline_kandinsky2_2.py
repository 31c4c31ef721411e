"""Kandinsky 2.2 decoder pipeline (CLIP image embedding → image).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/kandinsky2_2/pipeline_kandinsky2_2.py`):
image-embedding-conditioned UNet (added-KV attention over projected image
tokens), learned-variance split under CFG, DDPM denoise, MoVQ decode.
TPU-first: one jitted `lax.scan` over all steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


def downscale_height_and_width(height, width, scale_factor=8):
    new_height = height // scale_factor**2
    if height % scale_factor**2 != 0:
        new_height += 1
    new_width = width // scale_factor**2
    if width % scale_factor**2 != 0:
        new_width += 1
    return new_height * scale_factor, new_width * scale_factor


@dataclass
class KandinskyV22PipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class KandinskyV22Pipeline(DiffusionPipeline):
    def __init__(self, unet, scheduler, movq):
        super().__init__()
        self.register_modules(unet=unet, scheduler=scheduler, movq=movq)
        self.movq_scale_factor = 2 ** (len(self.movq[0].config.block_out_channels) - 1) if movq is not None else 8

    def _denoise(self, unet_params, latents, image_embeds, timesteps, state, guidance_scale, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            noise_pred = unet(
                unet_params, latent_input, t,
                encoder_hidden_states=None,
                added_cond_kwargs={"image_embeds": image_embeds},
            ).sample
            if do_cfg:
                noise_pred, variance_pred = jnp.split(noise_pred, 2, axis=1)
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                _, variance_text = jnp.split(variance_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
                noise_pred = jnp.concatenate([noise_pred, variance_text], axis=1)
            if not (scheduler.config.get("variance_type") in ("learned", "learned_range")):
                noise_pred = jnp.split(noise_pred, 2, axis=1)[0]
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        image_embeds: jax.Array,
        negative_image_embeds: Optional[jax.Array] = None,
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 100,
        guidance_scale: float = 4.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        movq, movq_params = self.movq
        if key is None:
            key = jax.random.PRNGKey(0)
        do_cfg = guidance_scale > 1.0
        batch_size = image_embeds.shape[0]

        if do_cfg:
            if negative_image_embeds is None:
                negative_image_embeds = jnp.zeros_like(image_embeds)
            image_embeds = jnp.concatenate([negative_image_embeds, image_embeds], axis=0)

        # downscale_height_and_width already returns the LATENT grid size
        # (reference pipeline_kandinsky2_2.py:246 feeds it straight to
        # prepare_latents)
        lh, lw = downscale_height_and_width(height, width, self.movq_scale_factor)
        num_channels_latents = unet.config.in_channels
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, num_channels_latents, lh, lw), key=lat_key)

        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, latents)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, num_inference_steps),
        )
        latents = denoise(unet_params, latents, image_embeds, state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit(
                "decode", lambda p, z: movq.decode(p, z, force_not_quantize=True).sample
            )
            image = decode(movq_params, latents)
            image = np.asarray(jnp.transpose(jnp.clip(image / 2 + 0.5, 0, 1), (0, 2, 3, 1)))

        if not return_dict:
            return (image,)
        return KandinskyV22PipelineOutput(images=image)
