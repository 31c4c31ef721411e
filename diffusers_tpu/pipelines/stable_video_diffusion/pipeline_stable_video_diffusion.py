"""Stable Video Diffusion image-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/stable_video_diffusion/pipeline_stable_video_diffusion.py:168`):
CLIP-vision image embedding (zeros for the uncond branch), noise-augmented
VAE image latents concatenated channel-wise every step (`:588`), fps/motion-
bucket/noise-aug added_time_ids, per-frame linear guidance ramp
min→max (`:571-575`), EDM-style Euler denoise, temporal-decoder VAE decode.
TPU-first: one jitted `lax.scan` over all steps with static num_frames.
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
from ...video_processor import VideoProcessor
from ..pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class StableVideoDiffusionPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class StableVideoDiffusionPipeline(DiffusionPipeline):
    def __init__(self, vae, image_encoder, unet, scheduler, feature_extractor=None):
        super().__init__()
        self.register_modules(
            vae=vae,
            image_encoder=image_encoder,
            unet=unet,
            scheduler=scheduler,
            feature_extractor=feature_extractor,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.video_processor = VideoProcessor(vae_scale_factor=self.vae_scale_factor)

    # ------------------------------------------------------------ condition
    def _encode_image(self, image: jax.Array, do_cfg: bool) -> jax.Array:
        """image: [B, 3, H, W] in [-1, 1] → CLIP-vision embeddings [2B or B, 1, D]."""
        encoder, params = self.image_encoder
        # CLIP normalization on a [0, 1] image (reference _encode_image resizes
        # to 224 and normalizes; callers pass pre-resized pixels here)
        img = (image + 1.0) / 2.0
        mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073]).reshape(1, 3, 1, 1)
        std = jnp.asarray([0.26862954, 0.26130258, 0.27577711]).reshape(1, 3, 1, 1)
        img = (img - mean) / std
        image_embeddings = encoder(params, img).image_embeds[:, None, :]
        if do_cfg:
            negative = jnp.zeros_like(image_embeddings)
            image_embeddings = jnp.concatenate([negative, image_embeddings], axis=0)
        return image_embeddings

    def _encode_vae_image(self, image: jax.Array, do_cfg: bool) -> jax.Array:
        vae, vae_params = self.vae
        image_latents = vae.encode(vae_params, image).mode()
        if do_cfg:
            image_latents = jnp.concatenate([jnp.zeros_like(image_latents), image_latents], axis=0)
        return image_latents

    def _get_add_time_ids(self, fps, motion_bucket_id, noise_aug_strength, batch_size, do_cfg):
        add_time_ids = jnp.asarray([[fps, motion_bucket_id, noise_aug_strength]], dtype=jnp.float32)
        add_time_ids = jnp.tile(add_time_ids, (batch_size, 1))
        if do_cfg:
            add_time_ids = jnp.concatenate([add_time_ids, add_time_ids], axis=0)
        return add_time_ids

    # ------------------------------------------------------------ denoise
    def _denoise(self, unet_params, latents, image_latents, image_embeddings, added_time_ids,
                 guidance_scale, num_inference_steps, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            latent_input = jnp.concatenate([latent_input, image_latents], axis=2)
            noise_pred = unet(
                unet_params, latent_input, t,
                encoder_hidden_states=image_embeddings,
                added_time_ids=added_time_ids,
            ).sample
            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (cond - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), state.timesteps)
        return latents

    def _decode(self, vae_params, latents):
        vae = self.vae[0]
        b, f, c, h, w = latents.shape
        latents = (latents / vae.config.scaling_factor).reshape(b * f, c, h, w)
        frames = vae.decode(vae_params, latents, num_frames=f).sample
        frames = frames.reshape(b, f, frames.shape[1], frames.shape[2], frames.shape[3])
        return jnp.clip(frames / 2 + 0.5, 0.0, 1.0)

    # ------------------------------------------------------------ __call__
    def __call__(
        self,
        image: Union[jax.Array, np.ndarray],  # [B, 3, H, W] in [-1, 1]
        height: int = 576,
        width: int = 1024,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 25,
        min_guidance_scale: float = 1.0,
        max_guidance_scale: float = 3.0,
        fps: int = 7,
        motion_bucket_id: int = 127,
        noise_aug_strength: float = 0.02,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        num_frames = num_frames or unet.config.num_frames
        if key is None:
            key = jax.random.PRNGKey(0)
        image = jnp.asarray(image)
        batch_size = image.shape[0]

        do_cfg = max_guidance_scale > 1.0
        image_embeddings = self._encode_image(image, do_cfg)

        # SVD was conditioned on fps-1 (reference __call__:507)
        fps = fps - 1

        key, noise_key, lat_key = jax.random.split(key, 3)
        noise = randn_tensor(image.shape, key=noise_key, dtype=image.dtype)
        noisy_image = image + noise_aug_strength * noise
        image_latents = self._encode_vae_image(noisy_image, do_cfg)
        image_latents = jnp.repeat(image_latents[:, None], num_frames, axis=1)

        added_time_ids = self._get_add_time_ids(fps, motion_bucket_id, noise_aug_strength, batch_size, do_cfg)

        num_channels_latents = unet.config.in_channels
        shape = (
            batch_size,
            num_frames,
            num_channels_latents // 2,
            height // self.vae_scale_factor,
            width // self.vae_scale_factor,
        )
        if latents is None:
            latents = randn_tensor(shape, key=lat_key)

        # per-frame guidance ramp [B, F, 1, 1, 1]
        guidance_scale = jnp.linspace(min_guidance_scale, max_guidance_scale, num_frames)
        guidance_scale = jnp.tile(guidance_scale[None], (batch_size, 1))[..., None, None, None]

        denoise = self._jit(
            "denoise",
            partial(self._denoise, num_inference_steps=num_inference_steps, do_cfg=do_cfg),
            static=(num_inference_steps, do_cfg),
        )
        latents = denoise(unet_params, latents, image_latents, image_embeddings, added_time_ids, guidance_scale)

        if output_type == "latent":
            frames = latents
        else:
            frames = self._jit("decode", self._decode)(vae_params, latents)
            frames = np.asarray(jnp.transpose(frames, (0, 1, 3, 4, 2)))

        if not return_dict:
            return (frames,)
        return StableVideoDiffusionPipelineOutput(frames=frames)
