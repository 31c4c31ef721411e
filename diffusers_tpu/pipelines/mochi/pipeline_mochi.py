"""Mochi-1 text-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/mochi/pipeline_mochi.py`): masked T5
encoding (zeroed padding), linear-quadratic sigma schedule (`:61`,
threshold_noise 0.025) through the flow-match Euler scheduler, CFG batch-2
denoise in float32, latent de-normalization with per-channel mean/std, causal
VAE decode. TPU-first: single scanned jitted denoise loop.
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
class MochiPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


def linear_quadratic_schedule(num_steps, threshold_noise, linear_steps=None):
    """Mochi's sigma ladder (reference pipeline_mochi.py:61)."""
    if num_steps == 1:
        return [1.0]
    if linear_steps is None:
        linear_steps = num_steps // 2
    linear_sigma_schedule = [i * threshold_noise / linear_steps for i in range(linear_steps)]
    threshold_noise_step_diff = linear_steps - threshold_noise * num_steps
    quadratic_steps = num_steps - linear_steps
    quadratic_coef = threshold_noise_step_diff / (linear_steps * quadratic_steps**2)
    linear_coef = threshold_noise / linear_steps - 2 * threshold_noise_step_diff / (quadratic_steps**2)
    const = quadratic_coef * (linear_steps**2)
    quadratic_sigma_schedule = [
        quadratic_coef * (i**2) + linear_coef * i + const for i in range(linear_steps, num_steps)
    ]
    sigma_schedule = linear_sigma_schedule + quadratic_sigma_schedule
    return [1.0 - x for x in sigma_schedule]


class MochiPipeline(DiffusionPipeline):
    def __init__(self, scheduler, vae, text_encoder, tokenizer, transformer,
                 force_zeros_for_empty_prompt: bool = False):
        super().__init__()
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
            transformer=transformer, scheduler=scheduler,
        )
        self.register_to_config(force_zeros_for_empty_prompt=force_zeros_for_empty_prompt)
        self.vae_spatial_compression_ratio = self.vae[0].spatial_compression_ratio if vae is not None else 8
        self.vae_temporal_compression_ratio = self.vae[0].temporal_compression_ratio if vae is not None else 6
        self.video_processor = VideoProcessor(vae_scale_factor=self.vae_spatial_compression_ratio)

    # ------------------------------------------------------------ prompts
    def _get_t5_prompt_embeds(self, prompt: List[str], max_sequence_length: int = 256):
        text_encoder, te_params = self.text_encoder
        inputs = self.tokenizer(
            prompt,
            padding="max_length",
            max_length=max_sequence_length,
            truncation=True,
            return_tensors="np",
        )
        ids = jnp.asarray(inputs.input_ids)
        mask = jnp.asarray(inputs.attention_mask)
        embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
        if self.config.force_zeros_for_empty_prompt and all(p == "" for p in prompt):
            embeds = jnp.zeros_like(embeds)
            mask = jnp.zeros_like(mask)
        embeds = embeds * mask[..., None].astype(embeds.dtype)
        return embeds, mask

    def encode_prompt(self, prompt, negative_prompt=None, do_cfg=True, max_sequence_length: int = 256):
        if isinstance(prompt, str):
            prompt = [prompt]
        prompt_embeds, prompt_mask = self._get_t5_prompt_embeds(prompt, max_sequence_length)
        if not do_cfg:
            return prompt_embeds, prompt_mask, None, None
        negative_prompt = negative_prompt or ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        neg_embeds, neg_mask = self._get_t5_prompt_embeds(negative_prompt, max_sequence_length)
        return prompt_embeds, prompt_mask, neg_embeds, neg_mask

    # ------------------------------------------------------------ denoise
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig", "TextKVCacheConfig")

    def _denoise(self, t_params, latents, prompt_embeds, prompt_mask, timesteps, state,
                 guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        from ...hooks.generic_cache import denoise_scan

        def forward(latents, t, sstate):
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            timestep = jnp.broadcast_to(t, (latent_input.shape[0],)).astype(latents.dtype)
            noise_pred = transformer(
                t_params, latent_input, prompt_embeds, timestep, prompt_mask
            ).sample.astype(jnp.float32)
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            return noise_pred

        latents = latents.astype(jnp.float32)
        return denoise_scan(forward, scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    # ------------------------------------------------------------ __call__
    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 480,
        width: int = 848,
        num_frames: int = 19,
        num_inference_steps: int = 64,
        guidance_scale: float = 4.5,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 256,
        output_type: str = "np",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, prompt_mask, neg_embeds, neg_mask = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length
        )
        batch_size = prompt_embeds.shape[0]
        if do_cfg:
            prompt_embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            prompt_mask = jnp.concatenate([neg_mask, prompt_mask], axis=0)

        num_latent_frames = (num_frames - 1) // self.vae_temporal_compression_ratio + 1
        shape = (
            batch_size,
            transformer.config.in_channels,
            num_latent_frames,
            height // self.vae_spatial_compression_ratio,
            width // self.vae_spatial_compression_ratio,
        )
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)

        sigmas = linear_quadratic_schedule(num_inference_steps, 0.025)
        state = self.scheduler.set_timesteps(num_inference_steps, sigmas=np.asarray(sigmas))

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg), callback_on_step_end,
            static=(guidance_scale, do_cfg))
        latents = denoise(t_params, latents, prompt_embeds, prompt_mask, state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            lm = vae.config.get("latents_mean")
            ls = vae.config.get("latents_std")
            if lm is not None and ls is not None:
                mean = jnp.asarray(lm).reshape(1, -1, 1, 1, 1)
                std = jnp.asarray(ls).reshape(1, -1, 1, 1, 1)
                latents = latents * std / vae.config.scaling_factor + mean
            else:
                latents = latents / vae.config.scaling_factor
            video = self._jit("decode", lambda p, z: vae.decode(p, z).sample)(vae_params, latents)
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video,)
        return MochiPipelineOutput(frames=video)
