"""Stable Diffusion panorama (MultiDiffusion) pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/stable_diffusion_panorama/pipeline_stable_diffusion_panorama.py:70`):
sliding 64x64 latent windows over the panorama, each window denoised per step
and the overlapping denoised views averaged (MultiDiffusion Eq. 5,
arXiv:2302.08113), with optional circular width padding for wrap-around
panoramas (`:759`).

TPU-native: the reference loops views per step in view_batch_size chunks;
here ALL views stack on the batch axis (static window slices), the UNet runs
ONCE per step over [V·2B, C, 64, 64], and the averaged fold-back is V static
scatter-adds — a single lax.scan over the schedule with no host round trips.
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


def get_views(panorama_height: int, panorama_width: int, window_size: int = 64,
              stride: int = 8, circular_padding: bool = False, scale_factor: int = 8):
    """Window coordinate mapping F_i (reference `:731`); latent units. The
    reference hardcodes the SD /8 VAE stride; `scale_factor` generalizes it."""
    panorama_height //= scale_factor
    panorama_width //= scale_factor
    nh = (panorama_height - window_size) // stride + 1 if panorama_height > window_size else 1
    if circular_padding:
        nw = panorama_width // stride if panorama_width > window_size else 1
    else:
        nw = (panorama_width - window_size) // stride + 1 if panorama_width > window_size else 1
    views = []
    for i in range(int(nh * nw)):
        h_start = (i // nw) * stride
        w_start = (i % nw) * stride
        views.append((h_start, h_start + window_size, w_start, w_start + window_size))
    return views


class StableDiffusionPanoramaPipeline(StableDiffusionPipeline):
    def _crop(self, latents, view, width, circular_padding):
        h0, h1, w0, w1 = view
        if circular_padding and w1 > width:
            return jnp.concatenate(
                [latents[:, :, h0:h1, w0:width], latents[:, :, h0:h1, : w1 - width]], axis=-1)
        return latents[:, :, h0:h1, w0:w1]

    def _denoise_panorama(self, unet_params, prompt_embeds, latents, guidance_scale,
                          num_inference_steps, do_cfg, views, circular_padding):
        unet = self.unet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)
        b = latents.shape[0]
        v = len(views)
        width = latents.shape[-1]
        # per-view prompt embeds; CFG halves stay [uncond·V | cond·V]
        if do_cfg:
            neg, pos = jnp.split(prompt_embeds, 2, axis=0)
            embeds = jnp.concatenate([jnp.tile(neg, (v, 1, 1)), jnp.tile(pos, (v, 1, 1))], axis=0)
        else:
            embeds = jnp.tile(prompt_embeds, (v, 1, 1))

        def step_fn(carry, t):
            latents, sstate = carry
            # gather every window onto the batch axis (static slices)
            view_lat = jnp.concatenate(
                [self._crop(latents, vw, width, circular_padding) for vw in views], axis=0)
            latent_input = jnp.concatenate([view_lat, view_lat], axis=0) if do_cfg else view_lat
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            t_b = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = unet(unet_params, latent_input, t_b, encoder_hidden_states=embeds).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            denoised = scheduler.step(sstate, noise_pred, t, view_lat)
            new_state = denoised.state
            denoised_views = jnp.split(denoised.prev_sample, v, axis=0)

            value = jnp.zeros_like(latents)
            count = jnp.zeros_like(latents)
            for vw, dv in zip(views, denoised_views):
                h0, h1, w0, w1 = vw
                if circular_padding and w1 > width:
                    cut = width - w0
                    value = value.at[:, :, h0:h1, w0:].add(dv[:, :, :, :cut])
                    count = count.at[:, :, h0:h1, w0:].add(1.0)
                    value = value.at[:, :, h0:h1, : w1 - width].add(dv[:, :, :, cut:])
                    count = count.at[:, :, h0:h1, : w1 - width].add(1.0)
                else:
                    value = value.at[:, :, h0:h1, w0:w1].add(dv)
                    count = count.at[:, :, h0:h1, w0:w1].add(1.0)
            latents = jnp.where(count > 0, value / jnp.maximum(count, 1.0), value)
            return (latents, new_state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), state.timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        height: Optional[int] = 512,
        width: Optional[int] = 2048,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        view_batch_size: int = 1,  # accepted for API parity; all views batch on TPU
        circular_padding: bool = False,
        window_size: int = 64,
        stride: int = 8,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        shape = (batch_size, unet.config.in_channels,
                 height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            latents = randn_tensor(shape, key=key)

        views = tuple(get_views(height, width, window_size=window_size, stride=stride,
                                circular_padding=circular_padding,
                                scale_factor=self.vae_scale_factor))
        denoise = self._jit(
            "denoise_panorama",
            partial(self._denoise_panorama, guidance_scale=guidance_scale,
                    num_inference_steps=num_inference_steps, do_cfg=do_cfg,
                    views=views, circular_padding=circular_padding),
            static=(guidance_scale, num_inference_steps, do_cfg, views, circular_padding),
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
