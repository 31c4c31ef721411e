"""Wan video-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/wan/pipeline_wan_video2video.py:176`
WanVideoToVideoPipeline): the input video is VAE-argmax-encoded, normalized
with the channelwise latent statistics (`:422-434`), noised to the
strength-selected timestep via the scheduler's `add_noise`/`scale_noise`
(`:436-439`), then denoised over the truncated schedule with the base
pipeline's CFG loop.

TPU-first: the truncated schedule only changes the scanned timestep array
length; everything else reuses the base WanPipeline single-scan denoise.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.jax_utils import randn_tensor
from ...video_processor import VideoProcessor
from ..inpaint_utils import check_strength_and_schedule
from .pipeline_wan import WanPipeline, WanPipelineOutput


class WanVideoToVideoPipeline(WanPipeline):
    def __init__(self, tokenizer, text_encoder, transformer, vae, scheduler):
        super().__init__(tokenizer=tokenizer, text_encoder=text_encoder,
                         transformer=transformer, vae=vae, scheduler=scheduler)
        self.video_processor = VideoProcessor(vae_scale_factor=self.vae_scale_factor_spatial)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        video=None,
        strength: float = 0.8,
        height: int = 480,
        width: int = 832,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 226,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        if not 0 <= strength <= 1:
            raise ValueError(f"strength must be in [0, 1], got {strength}")

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = prompt_embeds.shape[0]

        vid = jnp.asarray(self.video_processor.preprocess_video(video, height=height, width=width),
                          jnp.float32)
        num_latent_frames = (vid.shape[2] - 1) // self.vae_scale_factor_temporal + 1
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        num_channels_latents = transformer.config.in_channels
        shape = (batch_size, num_channels_latents, num_latent_frames, lh, lw)

        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sample_shape=shape)
        except TypeError:
            state = self.scheduler.set_timesteps(num_inference_steps)

        init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
        t_start = max(num_inference_steps - init_timestep, 0)
        timesteps = state.timesteps[t_start:]
        check_strength_and_schedule(strength, timesteps)

        if latents is None:
            init_latents = vae.encode(vae_params, vid).mode()
            if init_latents.shape[0] < batch_size:
                init_latents = jnp.repeat(init_latents, batch_size // init_latents.shape[0], axis=0)
            lm = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1, 1)
            ls = jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1, 1)
            init_latents = (init_latents - lm) / ls
            key, noise_key = jax.random.split(key)
            noise = randn_tensor(shape, key=noise_key)
            if hasattr(self.scheduler, "add_noise"):
                latents = self.scheduler.add_noise(state, init_latents, noise, timesteps[:1])
            else:
                latents = self.scheduler.scale_noise(state, init_latents, timesteps[:1], noise)

        rope_cos, rope_sin = transformer.rope(num_latent_frames, lh, lw)
        denoise = self._jit("denoise", partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
                            static=(guidance_scale, do_cfg))
        latents = denoise(t_params, latents, prompt_embeds, negative_embeds, rope_cos, rope_sin,
                          timesteps, state)

        if output_type == "latent":
            out_video = latents
        else:
            lm = vae.config.get("latents_mean")
            ls = vae.config.get("latents_std")
            if lm is not None and ls is not None:
                mean = jnp.asarray(lm).reshape(1, -1, 1, 1, 1)
                std = jnp.asarray(ls).reshape(1, -1, 1, 1, 1)
                latents = latents * std + mean
            out_video = self._jit("decode", lambda p, z: vae.decode(p, z).sample)(vae_params, latents)
            out_video = np.asarray(jnp.transpose(jnp.clip(out_video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (out_video,)
        return WanPipelineOutput(frames=out_video)
