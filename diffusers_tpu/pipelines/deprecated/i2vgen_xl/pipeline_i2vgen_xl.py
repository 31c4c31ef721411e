"""I2VGen-XL image-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/i2vgen_xl/pipeline_i2vgen_xl.py:96`):
CLIP text + CLIP-vision image encodings, VAE first-frame latents with
frame-position masks, fps micro-conditioning, CFG denoise (negative image
embeddings are zeros), per-frame VAE decode. TPU-first: jitted encode
stages, ONE lax.scan over timesteps, folded-batch decode.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....utils import BaseOutput, logging
from ....utils.jax_utils import randn_tensor
from ....video_processor import VideoProcessor
from ...pipeline_utils import DiffusionPipeline

logger = logging.get_logger(__name__)


@dataclass
class I2VGenXLPipelineOutput(BaseOutput):
    frames: Union[np.ndarray, List]


class I2VGenXLPipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig", "TextKVCacheConfig")
    _optional_components = ["feature_extractor"]

    def __init__(self, vae, text_encoder, tokenizer, image_encoder, unet, scheduler,
                 feature_extractor=None):
        super().__init__()
        self.register_modules(vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
                              image_encoder=image_encoder, unet=unet, scheduler=scheduler,
                              feature_extractor=feature_extractor)
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1)
        self.video_processor = VideoProcessor(vae_scale_factor=self.vae_scale_factor, do_resize=False)

    def encode_prompt(self, prompt, negative_prompt, do_cfg):
        if isinstance(prompt, str):
            prompt = [prompt]
        encoder, params = self.text_encoder
        tok = lambda texts: jnp.asarray(self.tokenizer(
            texts, padding="max_length", max_length=self.tokenizer.model_max_length,
            truncation=True, return_tensors="np").input_ids)
        encode = self._jit("encode", lambda p, ids: encoder(p, ids).last_hidden_state)
        embeds = encode(params, tok(prompt))
        if not do_cfg:
            return embeds
        negative = negative_prompt or ""
        if isinstance(negative, str):
            negative = [negative] * len(prompt)
        return jnp.concatenate([encode(params, tok(negative)), embeds], axis=0)

    def _encode_image(self, image, do_cfg):
        """image: [B, C, H, W] in [-1, 1] → CLIP image_embeds [2B|B, 1, D]
        (negative embeddings are zeros, reference `:357`)."""
        encoder, params = self.image_encoder
        embed = self._jit("encode_image", lambda p, x: encoder(p, x).image_embeds)
        embeds = embed(params, jnp.asarray(image))[:, None, :]
        if do_cfg:
            embeds = jnp.concatenate([jnp.zeros_like(embeds), embeds], axis=0)
        return embeds

    def prepare_image_latents(self, image, num_frames, key, do_cfg):
        """VAE-encode the conditioning image; frames 1..F-1 carry constant
        frame-position masks (reference `:452-482`)."""
        vae, vae_params = self.vae

        def encode(p, x, k):
            dist = vae.encode(p, x)
            dist = dist.latent_dist if hasattr(dist, "latent_dist") else dist
            return dist.sample(k) * vae.config.scaling_factor

        lat = self._jit("encode_vae", encode)(vae_params, jnp.asarray(image), key)
        lat = lat[:, :, None]  # [B, C, 1, h, w]
        if num_frames > 1:
            masks = [jnp.ones_like(lat[:, :, :1]) * ((i + 1) / (num_frames - 1))
                     for i in range(num_frames - 1)]
            lat = jnp.concatenate([lat] + masks, axis=2)
        if do_cfg:
            lat = jnp.concatenate([lat, lat], axis=0)
        return lat

    def _denoise(self, unet_params, latents, prompt_embeds, fps_tensor, image_latents,
                 image_embeddings, timesteps, state, guidance_scale, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler
        from ....hooks.generic_cache import denoise_scan

        def forward(latents, t, sstate):
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = unet(
                unet_params, latent_input, t, fps=fps_tensor, image_latents=image_latents,
                image_embeddings=image_embeddings, encoder_hidden_states=prompt_embeds,
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            return noise_pred

        return denoise_scan(forward, scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None))

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        image=None,  # [B, C, H, W] in [-1, 1] (np/jnp) or PIL
        height: Optional[int] = None,
        width: Optional[int] = None,
        target_fps: Optional[int] = 16,
        num_frames: int = 16,
        num_inference_steps: int = 50,
        guidance_scale: float = 9.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "np",
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
        batch = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        if not isinstance(image, (np.ndarray, jnp.ndarray)):
            image = self.video_processor.preprocess(image)
        image = jnp.asarray(image)

        image_embeddings = self._encode_image(image, do_cfg)
        key, vae_key, latents_key = jax.random.split(key, 3)
        image_latents = self.prepare_image_latents(image, num_frames, vae_key, do_cfg)

        fps_tensor = jnp.full(((2 if do_cfg else 1) * batch,), target_fps, jnp.float32)

        state = self.scheduler.set_timesteps(num_inference_steps)
        if latents is None:
            shape = (batch, unet.config.in_channels, num_frames,
                     height // self.vae_scale_factor, width // self.vae_scale_factor)
            latents = randn_tensor(shape, key=latents_key)
        latents = latents * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, latents)

        from functools import partial

        denoise = self._jit("denoise", partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
                            static=(guidance_scale, do_cfg))
        latents = denoise(unet_params, latents, prompt_embeds, fps_tensor, image_latents,
                          image_embeddings, state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            def decode(p, z):
                b, c, f, h, w = z.shape
                z = jnp.transpose(z, (0, 2, 1, 3, 4)).reshape(b * f, c, h, w)
                img = vae.decode(p, z / vae.config.scaling_factor).sample
                img = img.reshape(b, f, *img.shape[1:])
                return jnp.transpose(img, (0, 2, 1, 3, 4))

            video = self._jit("decode", decode)(vae_params, latents)
            video = self.video_processor.postprocess_video(video, output_type=output_type)

        if not return_dict:
            return (video,)
        return I2VGenXLPipelineOutput(frames=video)
