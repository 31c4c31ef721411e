"""LTX latent-upsample pipeline (2x spatial upscale in latent space).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/ltx/pipeline_ltx_latent_upsample.py:43`
LTXLatentUpsamplePipeline): normalized latents (or a VAE-encoded video) are
denormalized, run through `LTXLatentUpsamplerModel`, optionally AdaIN-matched
to the pre-upsample statistics (`adain_filter_latent` `:94`), optionally
tone-mapped (`tone_map_latents` `:123`), then re-normalized (latent output)
or decoded with the LTX timestep-conditioned decoder.

TPU-first: AdaIN runs vectorized over [B, C] statistics (no per-channel
Python loops); upsample + filters + decode compile into one jit.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput
from ...utils.jax_utils import randn_tensor
from ...video_processor import VideoProcessor
from ..pipeline_utils import DiffusionPipeline
from .pipeline_ltx import LTXPipeline, LTXPipelineOutput


def adain_filter_latent(latents: jax.Array, reference_latents: jax.Array,
                        factor: float = 1.0) -> jax.Array:
    """Per-(batch, channel) AdaIN toward the reference statistics
    (reference `:94-121`), vectorized over [B, C]."""
    axes = tuple(range(2, latents.ndim))
    i_mean = jnp.mean(latents, axis=axes, keepdims=True)
    i_sd = jnp.std(latents, axis=axes, keepdims=True, ddof=1)
    r_mean = jnp.mean(reference_latents, axis=axes, keepdims=True)
    r_sd = jnp.std(reference_latents, axis=axes, keepdims=True, ddof=1)
    result = ((latents - i_mean) / i_sd) * r_sd + r_mean
    return latents + factor * (result - latents)


def tone_map_latents(latents: jax.Array, compression: float) -> jax.Array:
    """Sigmoid dynamic-range compression (reference `:123-153`)."""
    scale_factor = compression * 0.75
    sigmoid_term = jax.nn.sigmoid(4.0 * scale_factor * (jnp.abs(latents) - 1.0))
    return latents * (1.0 - 0.8 * scale_factor * sigmoid_term)


class LTXLatentUpsamplePipeline(DiffusionPipeline):
    _normalize_latents = staticmethod(LTXPipeline._normalize_latents)
    _denormalize_latents = staticmethod(LTXPipeline._denormalize_latents)

    def __init__(self, vae, latent_upsampler):
        super().__init__()
        self.register_modules(vae=vae, latent_upsampler=latent_upsampler)
        self.vae_spatial_compression_ratio = vae[0].spatial_compression_ratio if vae is not None else 32
        self.vae_temporal_compression_ratio = vae[0].temporal_compression_ratio if vae is not None else 8
        self.video_processor = VideoProcessor(vae_scale_factor=self.vae_spatial_compression_ratio)

    def __call__(
        self,
        video=None,
        height: int = 512,
        width: int = 704,
        latents: Optional[jax.Array] = None,
        decode_timestep: float = 0.0,
        decode_noise_scale: Optional[float] = None,
        adain_factor: float = 0.0,
        tone_map_compression_ratio: float = 0.0,
        key: Optional[jax.Array] = None,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        vae, vae_params = self.vae
        upsampler, up_params = self.latent_upsampler
        if (video is None) == (latents is None):
            raise ValueError("Provide exactly one of `video` or `latents`.")
        if not 0 <= tone_map_compression_ratio <= 1:
            raise ValueError("`tone_map_compression_ratio` must be in [0, 1]")
        if key is None:
            key = jax.random.PRNGKey(0)
        key, enc_key, decode_key = jax.random.split(key, 3)

        if video is not None:
            vid = self.video_processor.preprocess_video(video, height=height, width=width)
            vid = jnp.asarray(vid, dtype=jnp.float32)
            num_frames = vid.shape[2]
            if num_frames % self.vae_temporal_compression_ratio != 1:
                keep = num_frames // self.vae_temporal_compression_ratio * self.vae_temporal_compression_ratio + 1
                vid = vid[:, :, :keep]
            latents = vae.encode(vae_params, vid).latent_dist.sample(enc_key)
            latents = self._normalize_latents(
                latents, vae_params["latents_mean"], vae_params["latents_std"],
                vae.config.scaling_factor)

        def upsample(up_params, vae_params, latents):
            lat = self._denormalize_latents(
                latents, vae_params["latents_mean"], vae_params["latents_std"],
                vae.config.scaling_factor)
            up = upsampler(up_params, lat)
            if adain_factor > 0.0:
                up = adain_filter_latent(up, lat, adain_factor)
            if tone_map_compression_ratio > 0.0:
                up = tone_map_latents(up, tone_map_compression_ratio)
            return up

        lat = self._jit("upsample", upsample,
                        static=(adain_factor, tone_map_compression_ratio))(
            up_params, vae_params, jnp.asarray(latents, jnp.float32))

        if output_type == "latent":
            out = self._normalize_latents(
                lat, vae_params["latents_mean"], vae_params["latents_std"],
                vae.config.scaling_factor)
            if not return_dict:
                return (out,)
            return LTXPipelineOutput(frames=out)

        temb = None
        if vae.config.timestep_conditioning:
            noise = randn_tensor(lat.shape, key=decode_key, dtype=lat.dtype)
            scale = decode_timestep if decode_noise_scale is None else decode_noise_scale
            lat = (1 - scale) * lat + scale * noise
            temb = jnp.full((lat.shape[0],), decode_timestep, lat.dtype)

        decode = self._jit(
            "decode",
            lambda pp, z, tt, kk: vae.decode(pp, z, tt, key=kk).sample,
            static=(vae.config.timestep_conditioning,),
        )
        frames = decode(vae_params, lat, temb, decode_key)
        frames = np.asarray(jnp.transpose(jnp.clip(frames / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))
        if not return_dict:
            return (frames,)
        return LTXPipelineOutput(frames=frames)
