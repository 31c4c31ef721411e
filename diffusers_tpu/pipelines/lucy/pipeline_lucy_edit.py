"""Lucy-Edit video editing pipeline (Wan-based instruction editing).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/lucy/pipeline_lucy_edit.py:134`
LucyEditPipeline): the input video is VAE-encoded with the posterior ARGMAX
(mode) and normalized with the Wan latent statistics (`:410`), then
channel-concatenated with the noise latents as the transformer input at
every step (`:663` — in_channels = 2·z_dim); UMT5 prompt encoding with the
Wan mask-zeroing; optional Wan-2.2 boundary two-stage denoising.

TPU-first: single-stage runs as one scanned jit; the two-stage boundary
split uses two scans at the host-computed boundary index (as in our
WanImageToVideoPipeline).
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
from ..wan.pipeline_wan import WanPipeline

logger = logging.get_logger(__name__)


@dataclass
class LucyPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class LucyEditPipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")
    _optional_components = ["transformer", "transformer_2"]

    def __init__(self, tokenizer, text_encoder, vae, scheduler, transformer=None,
                 transformer_2=None, boundary_ratio=None, expand_timesteps: bool = False):
        super().__init__()
        self.register_modules(vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
                              transformer=transformer, scheduler=scheduler,
                              transformer_2=transformer_2)
        self.register_to_config(boundary_ratio=boundary_ratio, expand_timesteps=expand_timesteps)
        self.vae_scale_factor_temporal = vae[0].config.scale_factor_temporal if vae is not None else 4
        self.vae_scale_factor_spatial = vae[0].config.scale_factor_spatial if vae is not None else 8

    _get_t5_prompt_embeds = WanPipeline._get_t5_prompt_embeds
    encode_prompt = WanPipeline.encode_prompt

    def prepare_condition_latents(self, video: jax.Array) -> jax.Array:
        """VAE argmax-encode the input video and normalize (reference :410).
        `video` is [B, C, F, H, W] in [-1, 1]."""
        vae, vae_params = self.vae
        encode = self._jit("encode_cond", lambda p, v: vae.encode(p, v).mode())
        cond = encode(vae_params, video)
        mean = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1, 1).astype(cond.dtype)
        std = jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1, 1).astype(cond.dtype)
        return (cond - mean) / std

    def _denoise(self, t_params, latents, cond_latents, prompt_embeds, negative_embeds,
                 rope_cos, rope_sin, timesteps, state, guidance_scale, do_cfg, which):
        transformer = self.transformer[0] if which == 0 else self.transformer_2[0]
        from ...hooks.generic_cache import denoise_scan

        def forward(lat, t, sstate):
            model_in = jnp.concatenate([lat, cond_latents], axis=1)
            timestep = jnp.broadcast_to(t, (lat.shape[0],))
            pred = transformer(t_params, model_in, timestep, prompt_embeds,
                               rotary_emb=(rope_cos, rope_sin)).sample
            if do_cfg:
                neg = transformer(t_params, model_in, timestep, negative_embeds,
                                  rotary_emb=(rope_cos, rope_sin)).sample
                pred = neg + guidance_scale * (pred - neg)
            return pred

        return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        video,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        guidance_scale_2: Optional[float] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "np",
        return_dict: bool = True,
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        if video is None:
            raise ValueError("`video` is required, received None.")
        if height % 16 != 0 or width % 16 != 0:
            raise ValueError(f"`height` and `width` must be divisible by 16, got {height}, {width}")
        if self.config.boundary_ratio is None and guidance_scale_2 is not None:
            raise ValueError("`guidance_scale_2` requires a configured `boundary_ratio`.")
        if self.config.expand_timesteps:
            raise NotImplementedError("expand_timesteps (Wan2.2 ti2v) is not supported yet.")
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg,
                                                            max_sequence_length)
        batch_size = prompt_embeds.shape[0]

        # video: np/jax array [F, H, W, C] in [0, 1] (or [B, F, H, W, C])
        video = jnp.asarray(video, jnp.float32)
        if video.ndim == 4:
            video = video[None]
        video = jnp.transpose(video, (0, 4, 1, 2, 3)) * 2.0 - 1.0  # [B, C, F, H, W]
        cond_latents = self.prepare_condition_latents(video)

        z_dim = vae.config.z_dim
        num_latent_frames = (video.shape[2] - 1) // self.vae_scale_factor_temporal + 1
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        shape = (batch_size, z_dim, num_latent_frames, lh, lw)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)
        assert latents.shape == cond_latents.shape, (latents.shape, cond_latents.shape)

        rope_cos, rope_sin = transformer.rope(num_latent_frames, lh, lw)
        state = self.scheduler.set_timesteps(num_inference_steps)
        timesteps = np.asarray(state.timesteps)

        if self.config.boundary_ratio is not None and self.transformer_2 is not None:
            if guidance_scale_2 is None:
                guidance_scale_2 = guidance_scale
            boundary_t = self.config.boundary_ratio * self.scheduler.config.num_train_timesteps
            k = int(np.sum(timesteps >= boundary_t))
            stages = [(0, state.timesteps[:k], guidance_scale), (1, state.timesteps[k:], guidance_scale_2)]
        else:
            stages = [(0, state.timesteps, guidance_scale)]

        for which, ts, gs in stages:
            if ts.shape[0] == 0:
                continue
            stage_params = t_params if which == 0 else self.transformer_2[1]
            denoise = self._denoise_entry(
                f"denoise_{which}",
                partial(self._denoise, guidance_scale=float(gs), do_cfg=do_cfg, which=which),
                callback_on_step_end,
                static=(float(gs), do_cfg, which),
            )
            latents = denoise(stage_params, latents, cond_latents, prompt_embeds,
                              negative_embeds, rope_cos, rope_sin, ts, state)

        if output_type == "latent":
            out_video = latents
        else:
            mean = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1, 1)
            std = jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1, 1)
            latents = latents * std + mean
            out_video = self._jit("decode", lambda p, z: vae.decode(p, z).sample)(vae_params, latents)
            out_video = np.asarray(jnp.transpose(jnp.clip(out_video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (out_video,)
        return LucyPipelineOutput(frames=out_video)
