"""HunyuanVideo Framepack pipeline (sectioned long-video generation).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/hunyuan_video/pipeline_hunyuan_video_framepack.py:218`
HunyuanVideoFramepackPipeline): the video is generated in latent sections of
`latent_window_size` frames; each section conditions on the first-frame
latents plus a [1x, 2x, 4x] history pyramid with explicit frame indices
(INVERTED_ANTI_DRIFTING `:867-898` — sections are generated back-to-front —
or VANILLA `:899-916` — front-to-back), CLIP/SigLIP image semantics, and a
distilled-guidance embedding. Decoded sections are soft-appended with a
linear crossfade over the overlap (`_soft_append` `:1079`). Optional
`last_image` blends its SigLIP embeds and seeds the first section's 1x
history (`:808-814, :893`).

TPU-first: every section runs the SAME jitted denoise scan — history
shapes are static ([1+1x, 2x, 4x] pyramid sizes are fixed) and the
section-dependent RoPE tables are precomputed host-side via
`transformer.pack_rope` and passed as arrays, so the section loop compiles
once; section decodes share one fixed-shape decode jit (plus one first/last
section variant).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils.jax_utils import randn_tensor
from ...video_processor import VideoProcessor
from .pipeline_hunyuan_video import (
    DEFAULT_PROMPT_TEMPLATE,
    HunyuanVideoPipeline,
    HunyuanVideoPipelineOutput,
)


class FramepackSamplingType:
    VANILLA = "vanilla"
    INVERTED_ANTI_DRIFTING = "inverted_anti_drifting"


class HunyuanVideoFramepackPipeline(HunyuanVideoPipeline):
    _supported_cache_configs = ()

    def __init__(self, text_encoder, tokenizer, transformer, vae, scheduler,
                 text_encoder_2, tokenizer_2, image_encoder, feature_extractor=None):
        super().__init__(text_encoder=text_encoder, tokenizer=tokenizer, transformer=transformer,
                         vae=vae, scheduler=scheduler, text_encoder_2=text_encoder_2,
                         tokenizer_2=tokenizer_2)
        self.register_modules(image_encoder=image_encoder, feature_extractor=feature_extractor)
        self.video_processor = VideoProcessor(vae_scale_factor=self.vae_scale_factor_spatial)

    def encode_image(self, image: jax.Array) -> jax.Array:
        """SigLIP semantic embeds of a [-1,1] NCHW image (reference `:446`)."""
        image_encoder, ie_params = self.image_encoder
        img01 = np.asarray(image) * 0.5 + 0.5
        if self.feature_extractor is not None:
            pixel_values = np.asarray(self.feature_extractor(
                images=img01, return_tensors="np", do_rescale=False)["pixel_values"])
        else:
            pixel_values = img01 * 2.0 - 1.0  # tiny-test path: raw pixels
        return image_encoder(ie_params, jnp.asarray(pixel_values)).last_hidden_state

    def _encode_image_latents(self, image: jax.Array, enc_key) -> jax.Array:
        vae, vae_params = self.vae
        lat = vae.encode(vae_params, jnp.asarray(image)[:, :, None]).sample(enc_key)
        return lat * vae.config.scaling_factor

    def _denoise_section(self, t_params, latents, rope_cos, rope_sin, prompt_embeds,
                         prompt_mask, pooled, image_embeds, guidance, latents_clean,
                         latents_2x, latents_4x, neg_embeds, neg_mask, neg_pooled,
                         timesteps, state, true_cfg_scale, do_true_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def forward(latents, t, embeds, mask, pool):
            timestep = jnp.broadcast_to(t, (latents.shape[0],))
            return transformer(
                t_params, latents, timestep, embeds, mask, pool,
                image_embeds=image_embeds, guidance=guidance,
                latents_clean=latents_clean, latents_history_2x=latents_2x,
                latents_history_4x=latents_4x,
                image_rotary_emb=(rope_cos, rope_sin),
            ).sample

        def step_fn(carry, t):
            latents, sstate = carry
            noise_pred = forward(latents, t, prompt_embeds, prompt_mask, pooled)
            if do_true_cfg:
                neg = forward(latents, t, neg_embeds, neg_mask, neg_pooled)
                noise_pred = neg + true_cfg_scale * (noise_pred - neg)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    @staticmethod
    def _soft_append(history: np.ndarray, current: np.ndarray, overlap: int = 0):
        """Linear crossfade over `overlap` frames (reference `:1079`)."""
        if overlap <= 0:
            return np.concatenate([history, current], axis=2)
        w = np.linspace(1, 0, overlap, dtype=history.dtype).reshape(1, 1, -1, 1, 1)
        blended = w * history[:, :, -overlap:] + (1 - w) * current[:, :, :overlap]
        return np.concatenate([history[:, :, :-overlap], blended, current[:, :, overlap:]], axis=2)

    def __call__(
        self,
        image=None,
        last_image=None,
        prompt: Union[str, List[str]] = None,
        prompt_2: Optional[Union[str, List[str]]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 720,
        width: int = 1280,
        num_frames: int = 129,
        latent_window_size: int = 9,
        num_inference_steps: int = 50,
        sigmas: Optional[List[float]] = None,
        true_cfg_scale: float = 1.0,
        guidance_scale: float = 6.0,
        key: Optional[jax.Array] = None,
        prompt_template: Dict[str, Any] = DEFAULT_PROMPT_TEMPLATE,
        max_sequence_length: int = 256,
        sampling_type: str = FramepackSamplingType.INVERTED_ANTI_DRIFTING,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        if sampling_type not in (FramepackSamplingType.VANILLA,
                                 FramepackSamplingType.INVERTED_ANTI_DRIFTING):
            raise ValueError(f"invalid sampling_type {sampling_type!r}")

        prompt_embeds, pooled, prompt_mask = self.encode_prompt(
            prompt, prompt_2, prompt_template, max_sequence_length)
        batch_size = prompt_embeds.shape[0]
        do_true_cfg = true_cfg_scale > 1.0 and negative_prompt is not None
        neg_embeds = neg_pooled = neg_mask = None
        if do_true_cfg:
            neg_embeds, neg_pooled, neg_mask = self.encode_prompt(
                negative_prompt, None, prompt_template, max_sequence_length)

        # image conditioning (semantics + first-frame latents)
        image = jnp.asarray(self.video_processor.preprocess(image, height, width))
        image_embeds = self.encode_image(image)
        key, enc_key = jax.random.split(key)
        image_latents = self._encode_image_latents(image, enc_key)
        last_image_latents = None
        if last_image is not None:
            last_image = jnp.asarray(self.video_processor.preprocess(last_image, height, width))
            image_embeds = (image_embeds + self.encode_image(last_image)) / 2
            key, enc_key2 = jax.random.split(key)
            last_image_latents = self._encode_image_latents(last_image, enc_key2)
        image_embeds = jnp.broadcast_to(
            image_embeds, (batch_size, *image_embeds.shape[1:]))

        num_channels_latents = transformer.config.in_channels
        window_num_frames = (latent_window_size - 1) * self.vae_scale_factor_temporal + 1
        num_latent_sections = max(1, (num_frames + window_num_frames - 1) // window_num_frames)
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial

        inverted = sampling_type == FramepackSamplingType.INVERTED_ANTI_DRIFTING
        if inverted:
            history_sizes = [1, 2, 16]
            history_latents = np.zeros((batch_size, num_channels_latents, sum(history_sizes), lh, lw),
                                       np.float32)
            total_generated = 0
        else:
            history_sizes = [16, 2, 1]
            history_latents = np.zeros((batch_size, num_channels_latents, sum(history_sizes), lh, lw),
                                       np.float32)
            history_latents = np.concatenate([history_latents, np.asarray(image_latents)], axis=2)
            total_generated = 1

        guidance = jnp.full((batch_size,), guidance_scale * 1000.0, dtype=jnp.float32)

        # schedule is shape-only → computed once, reused per section
        if sigmas is None:
            sigmas = np.linspace(1.0, 0.0, num_inference_steps + 1)[:-1]
        image_seq_len = latent_window_size * lh * lw / transformer.config.patch_size**2
        mu = calculate_shift(
            image_seq_len,
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        mu = min(mu, math.log(7.0))
        if self.scheduler.config.get("use_dynamic_shifting", False):
            state = self.scheduler.set_timesteps(sigmas=list(sigmas), mu=mu)
        else:
            state = self.scheduler.set_timesteps(sigmas=list(sigmas))

        denoise = self._jit(
            "denoise_section",
            lambda *a: self._denoise_section(*a, true_cfg_scale=true_cfg_scale,
                                             do_true_cfg=do_true_cfg),
            static=(true_cfg_scale, do_true_cfg),
        )
        decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)

        history_video = None
        for k in range(num_latent_sections):
            is_first = k == 0
            is_last = k == num_latent_sections - 1
            if inverted:
                latent_paddings = list(reversed(range(num_latent_sections)))
                if num_latent_sections > 4:
                    latent_paddings = [3] + [2] * (num_latent_sections - 3) + [1, 0]
                pad = latent_paddings[k] * latent_window_size
                splits = [1, pad, latent_window_size, *history_sizes]
                offs = np.cumsum([0] + splits)
                idx_prefix = np.arange(offs[0], offs[1])
                idx_latents = np.arange(offs[2], offs[3])
                idx_1x = np.arange(offs[3], offs[4])
                idx_2x = np.arange(offs[4], offs[5])
                idx_4x = np.arange(offs[5], offs[6])
                idx_clean = np.concatenate([idx_prefix, idx_1x])
                h1x, h2x, h4x = np.split(history_latents[:, :, : sum(history_sizes)],
                                         np.cumsum(history_sizes)[:-1], axis=2)
                if last_image_latents is not None and is_first:
                    h1x = np.asarray(last_image_latents)
                latents_clean = np.concatenate([np.asarray(image_latents), h1x], axis=2)
            else:
                splits = [1, *history_sizes, latent_window_size]
                offs = np.cumsum([0] + splits)
                idx_prefix = np.arange(offs[0], offs[1])
                idx_4x = np.arange(offs[1], offs[2])
                idx_2x = np.arange(offs[2], offs[3])
                idx_1x = np.arange(offs[3], offs[4])
                idx_latents = np.arange(offs[4], offs[5])
                idx_clean = np.concatenate([idx_prefix, idx_1x])
                h4x, h2x, h1x = np.split(history_latents[:, :, -sum(history_sizes):],
                                         np.cumsum(history_sizes)[:-1], axis=2)
                latents_clean = np.concatenate([np.asarray(image_latents), h1x], axis=2)

            rope_cos, rope_sin = transformer.pack_rope(
                height=lh, width=lw, indices_latents=idx_latents,
                indices_clean=idx_clean, indices_2x=idx_2x, indices_4x=idx_4x,
            )

            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, num_channels_latents, latent_window_size, lh, lw),
                                   key=lat_key)

            latents = denoise(
                t_params, latents, jnp.asarray(rope_cos), jnp.asarray(rope_sin),
                prompt_embeds, prompt_mask, pooled, image_embeds, guidance,
                jnp.asarray(latents_clean), jnp.asarray(h2x), jnp.asarray(h4x),
                neg_embeds, neg_mask, neg_pooled, state.timesteps, state,
            )
            latents = np.asarray(latents, np.float32)

            if inverted:
                if is_last:
                    latents = np.concatenate([np.asarray(image_latents), latents], axis=2)
                total_generated += latents.shape[2]
                history_latents = np.concatenate([latents, history_latents], axis=2)
                real_history = history_latents[:, :, :total_generated]
                section_frames = (latent_window_size * 2 + 1) if is_last else (latent_window_size * 2)
                sl = slice(0, section_frames)
            else:
                total_generated += latents.shape[2]
                history_latents = np.concatenate([history_latents, latents], axis=2)
                real_history = history_latents[:, :, -total_generated:]
                section_frames = latent_window_size * 2
                sl = slice(-section_frames, None)

            if output_type == "latent":
                history_video = real_history
            elif history_video is None:
                history_video = np.asarray(decode(vae_params, jnp.asarray(real_history)))
            else:
                overlap = (latent_window_size - 1) * self.vae_scale_factor_temporal + 1
                cur = np.asarray(decode(vae_params, jnp.asarray(real_history[:, :, sl])))
                if inverted:
                    history_video = self._soft_append(cur, history_video, overlap)
                else:
                    history_video = self._soft_append(history_video, cur, overlap)

        if output_type == "latent":
            video = history_video
        else:
            n = history_video.shape[2]
            n = (n - 1) // self.vae_scale_factor_temporal * self.vae_scale_factor_temporal + 1
            video = history_video[:, :, :n]
            video = np.transpose(np.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1))

        if not return_dict:
            return (video,)
        return HunyuanVideoPipelineOutput(frames=video)
