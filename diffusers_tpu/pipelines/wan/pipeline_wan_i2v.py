"""Wan image-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/wan/pipeline_wan_i2v.py:129`
WanImageToVideoPipeline): the input image (and optional `last_image` for
first-last-frame interpolation) is VAE-encoded into a zero-padded clip and
concatenated with a first(/last)-frame latent mask (`:393` prepare_latents),
CLIP-vision penultimate hidden states as image context (`:254`), UMT5 text
conditioning, optional Wan-2.2 two-stage denoising where `transformer` covers
timesteps >= `boundary_ratio * num_train_timesteps` and `transformer_2` the
rest, each with its own guidance scale (`:156,:590`).

TPU-first: the two-stage split is two jitted scans over the host-computed
boundary index (no data-dependent branching inside the scan). The
`expand_timesteps` (ti2v per-token timestep) mode is not implemented.
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
from .pipeline_wan import WanPipeline

logger = logging.get_logger(__name__)


@dataclass
class WanPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class WanImageToVideoPipeline(DiffusionPipeline):
    _optional_components = ["transformer", "transformer_2", "image_encoder", "image_processor"]
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")

    def __init__(self, tokenizer, text_encoder, transformer, vae, scheduler,
                 image_encoder=None, image_processor=None, transformer_2=None,
                 boundary_ratio: Optional[float] = None, expand_timesteps: bool = False):
        super().__init__()
        if expand_timesteps:
            raise NotImplementedError("expand_timesteps (ti2v per-token timesteps) is not implemented")
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer, transformer=transformer,
            scheduler=scheduler, image_encoder=image_encoder, image_processor=image_processor,
            transformer_2=transformer_2,
        )
        self.register_to_config(boundary_ratio=boundary_ratio, expand_timesteps=expand_timesteps)
        self.vae_scale_factor_temporal = vae[0].config.scale_factor_temporal if vae is not None else 4
        self.vae_scale_factor_spatial = vae[0].config.scale_factor_spatial if vae is not None else 8

    _get_t5_prompt_embeds = WanPipeline._get_t5_prompt_embeds
    encode_prompt = WanPipeline.encode_prompt

    def encode_image(self, image):
        image_encoder, ie_params = self.image_encoder
        inputs = self.image_processor(images=image, return_tensors="np")
        out = image_encoder(ie_params, jnp.asarray(np.asarray(inputs["pixel_values"])),
                            output_hidden_states=True)
        return out.hidden_states[-2]

    def prepare_latents(self, image: jax.Array, batch_size: int, num_channels_latents: int,
                        height: int, width: int, num_frames: int, key: jax.Array,
                        latents: Optional[jax.Array] = None,
                        last_image: Optional[jax.Array] = None):
        vae, vae_params = self.vae
        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        if latents is None:
            latents = randn_tensor(
                (batch_size, num_channels_latents, num_latent_frames, lh, lw), key=key)

        if last_image is None:
            video_condition = jnp.concatenate(
                [image[:, :, None],
                 jnp.zeros((image.shape[0], image.shape[1], num_frames - 1, height, width), image.dtype)],
                axis=2)
        else:
            video_condition = jnp.concatenate(
                [image[:, :, None],
                 jnp.zeros((image.shape[0], image.shape[1], num_frames - 2, height, width), image.dtype),
                 last_image[:, :, None]],
                axis=2)
        latent_condition = vae.encode(vae_params, video_condition).mode()
        latent_condition = jnp.repeat(latent_condition, batch_size // latent_condition.shape[0], axis=0)
        lm = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1, 1)
        ls = jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1, 1)
        latent_condition = (latent_condition - lm) / ls

        mask = np.ones((batch_size, 1, num_frames, lh, lw), np.float32)
        if last_image is None:
            mask[:, :, 1:] = 0
        else:
            mask[:, :, 1:-1] = 0
        first = np.repeat(mask[:, :, 0:1], self.vae_scale_factor_temporal, axis=2)
        mask = np.concatenate([first, mask[:, :, 1:]], axis=2)
        mask = mask.reshape(batch_size, -1, self.vae_scale_factor_temporal, lh, lw)
        mask = np.transpose(mask, (0, 2, 1, 3, 4))
        return latents, jnp.concatenate([jnp.asarray(mask), latent_condition], axis=1)

    def _denoise(self, t_params, latents, condition, prompt_embeds, negative_embeds,
                 image_embeds, rope, timesteps, state, guidance_scale, do_cfg, which):
        transformer = self.transformer[0] if which == 1 else self.transformer_2[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_in = jnp.concatenate([latents, condition], axis=1)
            timestep = jnp.broadcast_to(t, (latents.shape[0],))
            kw = {}
            if image_embeds is not None:
                kw["encoder_hidden_states_image"] = image_embeds
            noise_cond = transformer(t_params, latent_in, timestep, prompt_embeds,
                                     rotary_emb=rope, **kw).sample
            if do_cfg:
                noise_uncond = transformer(t_params, latent_in, timestep, negative_embeds,
                                           rotary_emb=rope, **kw).sample
                noise_pred = noise_uncond + guidance_scale * (noise_cond - noise_uncond)
            else:
                noise_pred = noise_cond
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, state), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents, state

    def __call__(
        self,
        image=None,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        guidance_scale_2: Optional[float] = None,
        image_embeds: Optional[jax.Array] = None,
        last_image=None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        boundary_ratio = self.config.get("boundary_ratio")
        if boundary_ratio is None and guidance_scale_2 is not None:
            raise ValueError("`guidance_scale_2` needs a pipeline `boundary_ratio`")
        if guidance_scale_2 is None:
            guidance_scale_2 = guidance_scale

        if num_frames % self.vae_scale_factor_temporal != 1:
            logger.warning("`num_frames - 1` must divide the temporal scale; rounding.")
            num_frames = num_frames // self.vae_scale_factor_temporal * self.vae_scale_factor_temporal + 1
        num_frames = max(num_frames, 1)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = prompt_embeds.shape[0]

        # Wan 2.2 (boundary_ratio set) drops the CLIP image context (`:390`)
        if boundary_ratio is None and image_embeds is None and self.image_encoder is not None:
            image_embeds = self.encode_image(image)
        if image_embeds is not None:
            image_embeds = jnp.repeat(image_embeds, batch_size, axis=0)

        def to_pixel(img):
            arr = jnp.asarray(np.asarray(img, np.float32))[None]
            if arr.ndim == 4 and arr.shape[-1] == 3:
                arr = jnp.transpose(arr, (0, 3, 1, 2)) / 127.5 - 1.0
            return arr

        key, lat_key = jax.random.split(key)
        latents, condition = self.prepare_latents(
            to_pixel(image), batch_size, vae.config.z_dim, height, width, num_frames, lat_key,
            latents, last_image=None if last_image is None else to_pixel(last_image))

        num_latent_frames, lh, lw = latents.shape[2], latents.shape[3], latents.shape[4]
        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sample_shape=latents.shape)
        except TypeError:
            state = self.scheduler.set_timesteps(num_inference_steps)
        rope = transformer.rope(num_latent_frames, lh, lw)

        if boundary_ratio is not None and self.transformer_2 is not None:
            boundary = boundary_ratio * self.scheduler.config.get("num_train_timesteps", 1000)
            ts = np.asarray(state.timesteps)
            k = int((ts >= boundary).sum())
            d1 = self._jit("denoise_hi", partial(self._denoise, guidance_scale=guidance_scale,
                                                 do_cfg=do_cfg, which=1),
                           static=(guidance_scale, do_cfg, 1))
            d2 = self._jit("denoise_lo", partial(self._denoise, guidance_scale=guidance_scale_2,
                                                 do_cfg=do_cfg, which=2),
                           static=(guidance_scale_2, do_cfg, 2))
            if k > 0:
                latents, state = d1(self.transformer[1], latents, condition, prompt_embeds,
                                    negative_embeds, image_embeds, rope, state.timesteps[:k], state)
            if k < len(ts):
                latents, state = d2(self.transformer_2[1], latents, condition, prompt_embeds,
                                    negative_embeds, image_embeds, rope, state.timesteps[k:], state)
        else:
            denoise = self._jit("denoise", partial(self._denoise, guidance_scale=guidance_scale,
                                                   do_cfg=do_cfg, which=1),
                                static=(guidance_scale, do_cfg, 1))
            latents, state = denoise(t_params, latents, condition, prompt_embeds, negative_embeds,
                                     image_embeds, rope, state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            lm = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1, 1)
            ls = jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1, 1)
            video = vae.decode(vae_params, latents * ls + lm).sample
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video,)
        return WanPipelineOutput(frames=video)
