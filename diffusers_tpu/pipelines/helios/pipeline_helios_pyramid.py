"""Helios pyramid (multi-resolution) autoregressive video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/helios/pipeline_helios_pyramid.py:121`
HeliosPyramidPipeline): same rolling multi-term history as `HeliosPipeline`,
but each chunk denoises through a resolution pyramid — latents start at
1/2^(S-1) scale (bilinear downsample x2 per stage, `:905`), and between
stages are nearest-upsampled and re-noised with spatially CORRELATED block
noise `alpha·x + beta·n` where n has covariance `(1+gamma)I - gamma·11^T`
per patch block (Cholesky, `sample_block_noise` `:443`) to fix block
artifacts; optional CFG-Zero* guidance (projected uncond scale + zero-init
of the first steps of stage 0, `:78`, `:1010`) and a distilled DMD mode that
re-noises toward each stage's start point (`:1043`).

TPU-first: each pyramid stage has a fixed shape, so each stage's denoise
scan jits once and is reused across chunks; the block-noise Cholesky factor
is a tiny host-side numpy constant folded into the jitted renoise.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import logging
from ...utils.jax_utils import randn_tensor
from .pipeline_helios import HeliosPipeline, HeliosPipelineOutput, calculate_shift

logger = logging.get_logger(__name__)


def optimized_scale(positive: jax.Array, negative: jax.Array) -> jax.Array:
    """CFG-Zero* projection coefficient (reference `:78`)."""
    pos = positive.reshape(positive.shape[0], -1).astype(jnp.float32)
    neg = negative.reshape(negative.shape[0], -1).astype(jnp.float32)
    dot = jnp.sum(pos * neg, axis=1, keepdims=True)
    sq = jnp.sum(neg * neg, axis=1, keepdims=True) + 1e-8
    return dot / sq


class HeliosPyramidPipeline(HeliosPipeline):
    def __init__(self, tokenizer, text_encoder, vae, scheduler, transformer,
                 is_cfg_zero_star: bool = False, is_distilled: bool = False):
        super().__init__(tokenizer, text_encoder, transformer, vae, scheduler)
        self.is_cfg_zero_star = is_cfg_zero_star
        self.is_distilled = is_distilled

    def _block_noise_chol(self, patch_size):
        """Cholesky factor of the intra-patch covariance (reference `:443`)."""
        gamma = self.scheduler.config.gamma
        _, ph, pw = patch_size
        block = ph * pw
        cov = np.eye(block) * (1 + gamma) - np.ones((block, block)) * gamma
        cov += np.eye(block) * 1e-8
        return np.linalg.cholesky(cov).astype(np.float32), block

    def sample_block_noise(self, key, batch_size, channel, num_frames, height, width, patch_size):
        L, block = self._block_noise_chol(patch_size)
        _, ph, pw = patch_size
        n = batch_size * channel * num_frames * (height // ph) * (width // pw)
        z = jax.random.normal(key, (n, block), jnp.float32)
        noise = z @ jnp.asarray(L).T
        noise = noise.reshape(batch_size, channel, num_frames, height // ph, width // pw, ph, pw)
        noise = jnp.transpose(noise, (0, 1, 2, 3, 5, 4, 6))
        return noise.reshape(batch_size, channel, num_frames, height, width)

    @staticmethod
    def _resize_spatial(latents: jax.Array, h: int, w: int, method: str) -> jax.Array:
        b, c, f, _, _ = latents.shape
        return jax.image.resize(latents, (b, c, f, h, w), method=method)

    def _denoise_stage(self, t_params, latents, hist_short, hist_mid, hist_long,
                       idx_cur, idx_short, idx_mid, idx_long, embeds, neg_embeds,
                       timesteps, state, start_point, guidance_scale, do_cfg,
                       is_zero_stage, zero_steps, use_zero_init):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        n_steps = timesteps.shape[0]

        def forward(lat, t, step):
            if do_cfg:
                lat_in = jnp.concatenate([lat, lat], axis=0)
                two = lambda x: jnp.concatenate([x, x], axis=0)
                tt = jnp.broadcast_to(t, (lat_in.shape[0],)).astype(lat.dtype)
                pred = transformer(
                    t_params, lat_in, tt, jnp.concatenate([embeds, neg_embeds]),
                    indices_hidden_states=two(idx_cur),
                    indices_latents_history_short=two(idx_short),
                    indices_latents_history_mid=two(idx_mid),
                    indices_latents_history_long=two(idx_long),
                    latents_history_short=two(hist_short), latents_history_mid=two(hist_mid),
                    latents_history_long=two(hist_long),
                ).sample
                cond, uncond = jnp.split(pred, 2, axis=0)
                if self.is_cfg_zero_star:
                    alpha = optimized_scale(cond, uncond)
                    alpha = alpha.reshape(alpha.shape[0], *([1] * (cond.ndim - 1))).astype(cond.dtype)
                    guided = uncond * alpha + guidance_scale * (cond - uncond * alpha)
                    if is_zero_stage and use_zero_init:
                        guided = jnp.where(step <= zero_steps, cond * 0.0, guided)
                    return guided
                return uncond + guidance_scale * (cond - uncond)
            tt = jnp.broadcast_to(t, (lat.shape[0],)).astype(lat.dtype)
            return transformer(
                t_params, lat, tt, embeds,
                indices_hidden_states=idx_cur,
                indices_latents_history_short=idx_short,
                indices_latents_history_mid=idx_mid,
                indices_latents_history_long=idx_long,
                latents_history_short=hist_short, latents_history_mid=hist_mid,
                latents_history_long=hist_long,
            ).sample

        def step_fn(carry, ts):
            lat, sstate = carry
            t, step = ts
            pred = forward(lat, t, step)
            if self.is_distilled:
                out = scheduler.step(sstate, pred, t, lat, dmd_noisy_tensor=start_point)
            else:
                out = scheduler.step(sstate, pred, t, lat)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(
            step_fn, (latents, state), (timesteps, jnp.arange(n_steps)))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 384,
        width: int = 640,
        num_frames: int = 132,
        sigmas: Optional[List[float]] = None,
        guidance_scale: float = 5.0,
        key: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "np",
        return_dict: bool = True,
        # ------------ I2V ------------
        image=None,
        image_latents: Optional[jax.Array] = None,
        fake_image_latents: Optional[jax.Array] = None,
        add_noise_to_image_latents: bool = True,
        image_noise_sigma_min: float = 0.111,
        image_noise_sigma_max: float = 0.135,
        # ------------ V2V ------------
        video_latents: Optional[jax.Array] = None,
        add_noise_to_video_latents: bool = True,
        video_noise_sigma_min: float = 0.111,
        video_noise_sigma_max: float = 0.135,
        # ------------ Stage 1 ------------
        history_sizes: Optional[List[int]] = None,
        num_latent_frames_per_chunk: int = 9,
        keep_first_frame: bool = True,
        is_skip_first_chunk: bool = False,
        is_amplify_first_chunk: bool = False,
        pyramid_num_inference_steps_list: Optional[List[int]] = None,
        use_zero_init: bool = True,
        zero_steps: int = 1,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        history_sizes = sorted(list(history_sizes) if history_sizes is not None else [16, 2, 1],
                               reverse=True)
        pyramid_num_inference_steps_list = pyramid_num_inference_steps_list or [10, 10, 10]
        pyramid_num_stages = len(pyramid_num_inference_steps_list)
        num_frames = max(num_frames, 1)

        do_cfg = guidance_scale > 1.0
        embeds, neg_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = embeds.shape[0]
        mean, inv_std = self._latent_stats()

        if image is not None and image_latents is None:
            key, ik = jax.random.split(key)
            image_latents, fake_image_latents = self._encode_image_latents(
                image, num_latent_frames_per_chunk, ik)
        if image_latents is not None and add_noise_to_image_latents:
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            s = jax.random.uniform(k1, (1,)) * (image_noise_sigma_max - image_noise_sigma_min) + image_noise_sigma_min
            image_latents = s * randn_tensor(image_latents.shape, key=k2) + (1 - s) * image_latents
            if fake_image_latents is not None:
                s2 = jax.random.uniform(k3, (1,)) * (video_noise_sigma_max - video_noise_sigma_min) + video_noise_sigma_min
                fake_image_latents = s2 * randn_tensor(fake_image_latents.shape, key=k4) + (1 - s2) * fake_image_latents
        if video_latents is not None and add_noise_to_video_latents:
            key, k1, k2 = jax.random.split(key, 3)
            f = video_latents.shape[2]
            fs = (jax.random.uniform(k1, (1, 1, f, 1, 1))
                  * (video_noise_sigma_max - video_noise_sigma_min) + video_noise_sigma_min)
            video_latents = fs * randn_tensor(video_latents.shape, key=k2) + (1 - fs) * video_latents

        num_channels_latents = transformer.config.in_channels
        window_num_frames = (num_latent_frames_per_chunk - 1) * self.vae_scale_factor_temporal + 1
        num_latent_chunk = max(1, (num_frames + window_num_frames - 1) // window_num_frames)
        if not keep_first_frame:
            history_sizes[-1] = history_sizes[-1] + 1
        num_history_latent_frames = sum(history_sizes)
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        history_latents = jnp.zeros(
            (batch_size, num_channels_latents, num_history_latent_frames, lh, lw), jnp.float32)
        total_generated = 0
        if fake_image_latents is not None:
            history_latents = jnp.concatenate([history_latents[:, :, :-1], fake_image_latents], axis=2)
            total_generated += 1
        if video_latents is not None:
            hf, vf = history_latents.shape[2], video_latents.shape[2]
            if vf < hf:
                history_latents = jnp.concatenate([history_latents[:, :, : hf - vf], video_latents], axis=2)
            else:
                history_latents = video_latents
            total_generated += vf

        if keep_first_frame:
            bounds = np.cumsum([1, *history_sizes, num_latent_frames_per_chunk])
            all_idx = np.arange(bounds[-1])
            idx_prefix, idx_long, idx_mid, idx_1x, idx_cur = np.split(all_idx, bounds[:-1])
            idx_short = np.concatenate([idx_prefix, idx_1x])
        else:
            bounds = np.cumsum([*history_sizes, num_latent_frames_per_chunk])
            all_idx = np.arange(bounds[-1])
            idx_long, idx_mid, idx_short, idx_cur = np.split(all_idx, bounds[:-1])
        idx_cur = jnp.asarray(idx_cur[None])
        idx_short = jnp.asarray(idx_short[None])
        idx_mid = jnp.asarray(idx_mid[None])
        idx_long = jnp.asarray(idx_long[None])

        patch = transformer.config.patch_size
        decode = self._jit("decode", lambda p, z: vae.decode(p, z / inv_std + mean).sample)

        history_video = None
        real_history_latents = None
        for k_chunk in range(num_latent_chunk):
            tail = history_latents[:, :, -num_history_latent_frames:]
            c0, c1 = history_sizes[0], history_sizes[0] + history_sizes[1]
            if keep_first_frame:
                hist_long, hist_mid, hist_1x = tail[:, :, :c0], tail[:, :, c0:c1], tail[:, :, c1:]
                if image_latents is None and k_chunk == 0:
                    prefix = jnp.zeros((batch_size, num_channels_latents, 1, lh, lw), jnp.float32)
                else:
                    prefix = image_latents
                hist_short = jnp.concatenate([prefix, hist_1x], axis=2)
            else:
                hist_long, hist_mid, hist_short = tail[:, :, :c0], tail[:, :, c0:c1], tail[:, :, c1:]

            key, lat_key = jax.random.split(key)
            latents = randn_tensor(
                (batch_size, num_channels_latents, num_latent_frames_per_chunk, lh, lw), key=lat_key)

            # start at 1/2^(S-1) scale (reference `:905`): bilinear x2 halvings
            ph, pw_ = lh, lw
            for _ in range(pyramid_num_stages - 1):
                ph //= 2
                pw_ //= 2
                latents = self._resize_spatial(latents, ph, pw_, "bilinear") * 2

            start_point_list = [latents] if self.is_distilled else None
            amplify = is_amplify_first_chunk and k_chunk == 0

            for stage_idx in range(pyramid_num_stages):
                image_seq_len = (latents.shape[-1] * latents.shape[-2] * latents.shape[-3]) // (
                    patch[0] * patch[1] * patch[2])
                mu = calculate_shift(
                    image_seq_len,
                    self.scheduler.config.get("base_image_seq_len", 256),
                    self.scheduler.config.get("max_image_seq_len", 4096),
                    self.scheduler.config.get("base_shift", 0.5),
                    self.scheduler.config.get("max_shift", 1.15),
                )

                if stage_idx > 0:
                    ph *= 2
                    pw_ *= 2
                    latents = self._resize_spatial(latents, ph, pw_, "nearest")
                    # stage-boundary renoise with correlated block noise (`:967`)
                    ori_sigma = 1 - self.scheduler.ori_start_sigmas[stage_idx]
                    gamma = self.scheduler.config.gamma
                    alpha = 1 / (math.sqrt(1 + (1 / gamma)) * (1 - ori_sigma) + ori_sigma)
                    beta = alpha * (1 - ori_sigma) / math.sqrt(gamma)
                    key, nk = jax.random.split(key)
                    noise = self.sample_block_noise(
                        nk, batch_size, num_channels_latents, latents.shape[2], ph, pw_, patch)
                    latents = alpha * latents + beta * noise
                    if self.is_distilled:
                        start_point_list.append(latents)

                try:
                    state = self.scheduler.set_timesteps(
                        pyramid_num_inference_steps_list[stage_idx], stage_index=stage_idx,
                        mu=mu, is_amplify_first_chunk=amplify, sample_shape=latents.shape)
                except TypeError:
                    state = self.scheduler.set_timesteps(
                        pyramid_num_inference_steps_list[stage_idx], stage_index=stage_idx,
                        mu=mu, is_amplify_first_chunk=amplify)

                start_point = start_point_list[stage_idx] if self.is_distilled else jnp.zeros_like(latents)
                denoise = self._jit(
                    f"denoise_stage{stage_idx}_amp{amplify}",
                    partial(self._denoise_stage, guidance_scale=float(guidance_scale), do_cfg=do_cfg,
                            is_zero_stage=stage_idx == 0, zero_steps=zero_steps,
                            use_zero_init=use_zero_init),
                    static=(float(guidance_scale), do_cfg, stage_idx == 0, zero_steps, use_zero_init),
                )
                latents = denoise(t_params, latents, hist_short, hist_mid, hist_long,
                                  idx_cur, idx_short, idx_mid, idx_long, embeds, neg_embeds,
                                  state.timesteps, state, start_point)

            if keep_first_frame and ((k_chunk == 0 and image_latents is None)
                                     or (is_skip_first_chunk and k_chunk == 1)):
                image_latents = latents[:, :, 0:1]

            total_generated += latents.shape[2]
            history_latents = jnp.concatenate([history_latents, latents], axis=2)
            real_history_latents = history_latents[:, :, -total_generated:]
            current_latents = real_history_latents[:, :, -num_latent_frames_per_chunk:]
            current_video = decode(vae_params, current_latents)
            history_video = current_video if history_video is None else jnp.concatenate(
                [history_video, current_video], axis=2)

        if output_type != "latent":
            g = history_video.shape[2]
            g = (g - 1) // self.vae_scale_factor_temporal * self.vae_scale_factor_temporal + 1
            video = history_video[:, :, :g]
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))
        else:
            video = real_history_latents

        if not return_dict:
            return (video,)
        return HeliosPipelineOutput(frames=video)
