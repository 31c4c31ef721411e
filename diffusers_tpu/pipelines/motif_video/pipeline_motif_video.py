"""Motif-Video text-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/motif_video/pipeline_motif_video.py:158`
MotifVideoPipeline): T5Gemma2 prompt encoding with attention masks, the
model input `cat([latents | latent_condition | latent_mask], dim=1)` — both
conditioning channels ZERO for pure t2v (`:673`) — guider-driven
conditional/unconditional batching, and Wan-VAE latent de-normalization
`z·std + mean` before decode.

TPU-first: one scanned jit; the guider's momentum-free guiders fold into
the scan directly (plain CFG path when no guider is registered).
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


@dataclass
class MotifVideoPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class MotifVideoPipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")
    _optional_components = ["guider", "image_processor_siglip", "image_encoder"]

    def __init__(self, tokenizer, text_encoder, vae, transformer, scheduler, guider=None):
        super().__init__()
        self.register_modules(tokenizer=tokenizer, text_encoder=text_encoder, vae=vae,
                              transformer=transformer, scheduler=scheduler, guider=guider)
        self.vae_scale_factor_temporal = vae[0].config.scale_factor_temporal if vae is not None else 4
        self.vae_scale_factor_spatial = vae[0].config.scale_factor_spatial if vae is not None else 8

    def _encode(self, prompt: List[str], max_sequence_length: int):
        text_encoder, te_params = self.text_encoder
        inputs = self.tokenizer(prompt, padding="max_length", max_length=max_sequence_length,
                                truncation=True, return_tensors="np")
        ids = jnp.asarray(np.asarray(inputs["input_ids"]))
        mask = jnp.asarray(np.asarray(inputs["attention_mask"]))
        embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
        return embeds, mask

    def encode_prompt(self, prompt, negative_prompt, do_cfg, max_sequence_length):
        if isinstance(prompt, str):
            prompt = [prompt]
        embeds, mask = self._encode(prompt, max_sequence_length)
        if not do_cfg:
            return embeds, mask, None, None
        negative_prompt = negative_prompt or ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        neg_embeds, neg_mask = self._encode(negative_prompt, max_sequence_length)
        return embeds, mask, neg_embeds, neg_mask

    def _denoise(self, t_params, latents, latent_condition, latent_mask, embeds, mask,
                 neg_embeds, neg_mask, timesteps, state, guidance_scale, do_cfg, n_steps):
        transformer = self.transformer[0]
        guider = self.guider
        from ...hooks.generic_cache import denoise_scan

        def forward(lat, t, sstate):
            hidden = jnp.concatenate([lat, latent_condition, latent_mask], axis=1)
            tt = jnp.broadcast_to(t, (lat.shape[0],))
            cond = transformer(t_params, hidden, tt, embeds,
                               encoder_attention_mask=mask).sample
            if do_cfg:
                uncond = transformer(t_params, hidden, tt, neg_embeds,
                                     encoder_attention_mask=neg_mask).sample
                if guider is not None:
                    return guider(cond, uncond)
                return uncond + guidance_scale * (cond - uncond)
            return cond

        return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 736,
        width: int = 1280,
        num_frames: int = 121,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        sigmas: Optional[List[float]] = None,
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

        do_cfg = guidance_scale > 1.0 or (
            self.guider is not None and getattr(self.guider, "num_conditions", 1) > 1)
        embeds, mask, neg_embeds, neg_mask = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = embeds.shape[0]

        latent_channels = vae.config.z_dim
        num_latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        shape = (batch_size, latent_channels, num_latent_frames, lh, lw)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)

        # pure t2v: zero condition + zero mask channels (reference `:673`)
        latent_condition = jnp.zeros(shape, latents.dtype)
        latent_mask = jnp.zeros((batch_size, 1, num_latent_frames, lh, lw), latents.dtype)

        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sigmas=sigmas)
        except TypeError:
            state = self.scheduler.set_timesteps(num_inference_steps)

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guidance_scale=float(guidance_scale), do_cfg=do_cfg,
                    n_steps=num_inference_steps), callback_on_step_end,
            static=(float(guidance_scale), do_cfg, num_inference_steps))
        latents = denoise(t_params, latents, latent_condition, latent_mask, embeds, mask,
                          neg_embeds, neg_mask, state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            mean = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1, 1)
            std = jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1, 1)
            lat = latents * std + mean
            video = self._jit("decode", lambda p, z: vae.decode(p, z).sample)(vae_params, lat)
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video,)
        return MotifVideoPipelineOutput(frames=video)
