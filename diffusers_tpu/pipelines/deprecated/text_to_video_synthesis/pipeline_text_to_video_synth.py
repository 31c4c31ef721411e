"""Text-to-video-synthesis (ModelScope/zeroscope) pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/text_to_video_synthesis/pipeline_text_to_video_synth.py`):
CLIP text encode → UNet3D CFG denoise → per-frame VAE decode. TPU-first:
jitted encode, ONE lax.scan over timesteps, frames decoded as a folded
batch in a single jit.
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
class TextToVideoSDPipelineOutput(BaseOutput):
    frames: Union[np.ndarray, List]


class TextToVideoSDPipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig", "TextKVCacheConfig")

    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler):
        super().__init__()
        self.register_modules(vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
                              unet=unet, scheduler=scheduler)
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1)
        self.video_processor = VideoProcessor(vae_scale_factor=self.vae_scale_factor)

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
            return embeds, None
        negative = negative_prompt or ""
        if isinstance(negative, str):
            negative = [negative] * len(prompt)
        return embeds, encode(params, tok(negative))

    def _denoise(self, unet_params, latents, prompt_embeds, timesteps, state, guidance_scale, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler
        from ....hooks.generic_cache import denoise_scan

        def forward(latents, t, sstate):
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = unet(
                unet_params, latent_input, jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds,
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
        height: Optional[int] = None,
        width: Optional[int] = None,
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

        embeds, negative_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch = embeds.shape[0]
        if do_cfg:
            prompt_embeds = jnp.concatenate([negative_embeds, embeds], axis=0)
        else:
            prompt_embeds = embeds

        state = self.scheduler.set_timesteps(num_inference_steps)
        if latents is None:
            shape = (batch, unet.config.in_channels, num_frames,
                     height // self.vae_scale_factor, width // self.vae_scale_factor)
            latents = randn_tensor(shape, key=key)
        latents = latents * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, latents)

        from functools import partial

        denoise = self._jit("denoise", partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
                            static=(guidance_scale, do_cfg))
        latents = denoise(unet_params, latents, prompt_embeds, state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            # [B, C, F, h, w] -> decode frames as a folded batch (reference
            # decode_latents `:341`)
            def decode(p, z):
                b, c, f, h, w = z.shape
                z = jnp.transpose(z, (0, 2, 1, 3, 4)).reshape(b * f, c, h, w)
                image = vae.decode(p, z / vae.config.scaling_factor).sample
                image = image.reshape(b, f, *image.shape[1:])
                return jnp.transpose(image, (0, 2, 1, 3, 4))  # [B, C, F, H, W]

            video = self._jit("decode", decode)(vae_params, latents)
            video = self.video_processor.postprocess_video(video, output_type=output_type)

        if not return_dict:
            return (video,)
        return TextToVideoSDPipelineOutput(frames=video)
