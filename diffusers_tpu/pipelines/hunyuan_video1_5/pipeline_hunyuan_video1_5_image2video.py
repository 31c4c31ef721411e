"""HunyuanVideo 1.5 image-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/hunyuan_video1_5/pipeline_hunyuan_video1_5_image2video.py:193`
HunyuanVideo15ImageToVideoPipeline): same dual text encoding as t2v, plus a
Siglip vision tower for semantic image embeds (`:391`) and a VAE argmax
(mode) encode of the reference image scaled by `scaling_factor` as the
first-frame latent condition — later frames zeroed, latent mask 1 at frame
0 only (`:594`).

TPU-first: the first-frame condition is built once on host-side shapes and
rides the scan as a constant; cond/uncond fold into one doubled batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput, logging
from .pipeline_hunyuan_video1_5 import (
    HunyuanVideo15Pipeline,
    HunyuanVideo15PipelineOutput,
    calculate_default_height_width,
)

logger = logging.get_logger(__name__)


class HunyuanVideo15ImageToVideoPipeline(HunyuanVideo15Pipeline):
    _optional_components = ["guider", "image_encoder", "feature_extractor"]

    def __init__(self, text_encoder, tokenizer, transformer, vae, scheduler,
                 text_encoder_2, tokenizer_2, guider=None, image_encoder=None,
                 feature_extractor=None):
        super().__init__(text_encoder, tokenizer, transformer, vae, scheduler,
                         text_encoder_2, tokenizer_2, guider=guider)
        self.register_modules(image_encoder=image_encoder, feature_extractor=feature_extractor)

    def encode_image(self, image, batch_size: int) -> jax.Array:
        """Siglip semantic embeds (reference `:391`)."""
        image_encoder, ie_params = self.image_encoder
        if self.feature_extractor is not None:
            pixel_values = np.asarray(self.feature_extractor(
                images=image, do_resize=True, return_tensors="np", do_convert_rgb=True
            )["pixel_values"])
        else:
            pixel_values = np.asarray(image, np.float32)
            if pixel_values.ndim == 3:
                pixel_values = pixel_values[None]
        out = image_encoder(ie_params, jnp.asarray(pixel_values))
        image_embeds = out.last_hidden_state
        return jnp.broadcast_to(image_embeds, (batch_size, *image_embeds.shape[1:]))

    def prepare_cond_latents_and_mask_i2v(self, latents, image):
        """First-frame VAE condition + frame-0 mask (reference `:594`)."""
        vae, vae_params = self.vae
        b, c, f, lh, lw = latents.shape
        img = jnp.asarray(np.asarray(image, np.float32))
        if img.ndim == 3:
            img = img[None]
        img = img[:, :, None]  # add frame axis: [B, C, 1, H, W]
        image_latents = vae.encode(vae_params, img).mode() * vae.config.scaling_factor
        cond = jnp.broadcast_to(image_latents, (b, c, 1, lh, lw)).astype(latents.dtype)
        cond_latents = jnp.concatenate(
            [cond, jnp.zeros((b, c, f - 1, lh, lw), latents.dtype)], axis=2)
        mask_latents = jnp.zeros((b, 1, f, lh, lw), latents.dtype)
        mask_latents = mask_latents.at[:, :, 0].set(1.0)
        return cond_latents, mask_latents

    def __call__(
        self,
        image=None,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_frames: int = 121,
        num_inference_steps: int = 50,
        sigmas: Optional[List[float]] = None,
        guidance_scale: Optional[float] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        image_embeds: Optional[jax.Array] = None,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        if height is None and width is None:
            img_arr = np.asarray(image, np.float32)
            ih, iw = (img_arr.shape[-2], img_arr.shape[-1]) if img_arr.ndim >= 3 else self.default_aspect_ratio[::-1]
            height, width = calculate_default_height_width(
                ih, iw, self.target_size, self.vae_scale_factor_spatial)

        embeds, mask, embeds_2, mask_2 = self.encode_prompt(prompt)
        batch_size = embeds.shape[0]

        guider = self.guider
        if guider is None and guidance_scale is not None and guidance_scale > 1.0:
            from ...guiders import ClassifierFreeGuidance
            guider = ClassifierFreeGuidance(guidance_scale=guidance_scale)
        do_cfg = guider is not None and getattr(guider, "num_conditions", 1) > 1

        neg_embeds = neg_mask = neg_embeds_2 = neg_mask_2 = None
        if do_cfg:
            negative_prompt = negative_prompt if negative_prompt is not None else ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * batch_size
            neg_embeds, neg_mask, neg_embeds_2, neg_mask_2 = self.encode_prompt(negative_prompt)

        if sigmas is None:
            sigmas = np.linspace(1.0, 0.0, num_inference_steps + 1)[:-1]
        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sigmas=np.asarray(sigmas))
        except (TypeError, ValueError):
            state = self.scheduler.set_timesteps(num_inference_steps)

        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lh = int(height) // self.vae_scale_factor_spatial
        lw = int(width) // self.vae_scale_factor_spatial
        if latents is None:
            key, lat_key = jax.random.split(key)
            from ...utils.jax_utils import randn_tensor
            latents = randn_tensor(
                (batch_size, self.num_channels_latents, num_latent_frames, lh, lw), key=lat_key)

        cond_latents, mask_latents = self.prepare_cond_latents_and_mask_i2v(latents, image)
        if image_embeds is None:
            image_embeds = self.encode_image(image, batch_size).astype(latents.dtype)

        from functools import partial
        denoise = self._jit(
            "denoise",
            partial(self._denoise, guider=guider, do_cfg=do_cfg),
            static=(id(guider), do_cfg),
        )
        latents = denoise(t_params, latents, cond_latents, mask_latents, image_embeds,
                          embeds, mask, embeds_2, mask_2, neg_embeds, neg_mask,
                          neg_embeds_2, neg_mask_2, state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            decode = self._jit(
                "decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            video = decode(vae_params, latents)
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video,)
        return HunyuanVideo15PipelineOutput(frames=video)
