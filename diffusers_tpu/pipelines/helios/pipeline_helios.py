"""Helios autoregressive (FramePack-style) video world-model pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/helios/pipeline_helios.py:108`
HeliosPipeline): UMT5 prompt encoding with masked zeroing, chunked rolling
generation — a fixed-size history buffer split into long (4x pooled) / mid
(2x pooled) / short windows fed to the transformer's multi-term memory
patches with FIXED relative frame indices (`:806-833`), fresh scheduler
timesteps per chunk with dynamic shift mu from the chunk token count
(`:846`), optional i2v first-frame latent prefix (noised, `:663`) and v2v
history bootstrap (`:693`), per-chunk Wan-VAE decode of the newest
`num_latent_frames_per_chunk` frames (`:930`).

TPU-first: every chunk has identical shapes, so ONE jitted scan (and one
jitted decode) is traced on the first chunk and reused for all subsequent
chunks; the UniPC history rides the scan carry.
"""

from __future__ import annotations

import html
import re
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


def prompt_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text).strip()


def calculate_shift(image_seq_len, base_seq_len=256, max_seq_len=4096, base_shift=0.5, max_shift=1.15):
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


@dataclass
class HeliosPipelineOutput(BaseOutput):
    frames: Union[List, np.ndarray]


class HeliosPipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")

    def __init__(self, tokenizer, text_encoder, transformer, vae, scheduler):
        super().__init__()
        self.register_modules(tokenizer=tokenizer, text_encoder=text_encoder,
                              transformer=transformer, vae=vae, scheduler=scheduler)
        if vae is not None:
            cfg = vae[0].config
            self.vae_scale_factor_temporal = cfg.get(
                "scale_factor_temporal", 2 ** sum(cfg.get("temperal_downsample", [True, True])))
            self.vae_scale_factor_spatial = cfg.get(
                "scale_factor_spatial", 2 ** (len(cfg.get("dim_mult", [1, 2, 4, 4])) - 1))
        else:
            self.vae_scale_factor_temporal = 4
            self.vae_scale_factor_spatial = 8

    def _get_t5_prompt_embeds(self, prompt: List[str], max_sequence_length: int = 512):
        text_encoder, te_params = self.text_encoder
        prompt = [prompt_clean(p) for p in prompt]
        inputs = self.tokenizer(prompt, padding="max_length", max_length=max_sequence_length,
                                truncation=True, add_special_tokens=True, return_tensors="np")
        ids = jnp.asarray(np.asarray(inputs["input_ids"]))
        mask = jnp.asarray(np.asarray(inputs["attention_mask"]))
        embeds = text_encoder(te_params, ids, attention_mask=mask).last_hidden_state
        return embeds * mask[..., None].astype(embeds.dtype)

    def encode_prompt(self, prompt, negative_prompt, do_cfg, max_sequence_length):
        if isinstance(prompt, str):
            prompt = [prompt]
        embeds = self._get_t5_prompt_embeds(prompt, max_sequence_length)
        if not do_cfg:
            return embeds, None
        negative_prompt = negative_prompt or ""
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompt)
        neg = self._get_t5_prompt_embeds(negative_prompt, max_sequence_length)
        return embeds, neg

    def _latent_stats(self):
        vae = self.vae[0]
        mean = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1, 1)
        inv_std = 1.0 / jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1, 1)
        return mean, inv_std

    def _encode_image_latents(self, image, num_latent_frames_per_chunk, key):
        """i2v: the image's own latent plus a 'fake' last-chunk-frame latent
        from a frozen repeat of the image (reference `:355`)."""
        vae, vae_params = self.vae
        mean, inv_std = self._latent_stats()
        img = jnp.asarray(np.asarray(image, np.float32))
        if img.ndim == 3:
            img = img[None]
        img = img[:, :, None]  # [B, C, 1, H, W]
        key, k1, k2 = jax.random.split(key, 3)
        lat = self.vae[0].encode(vae_params, img)
        lat = lat.sample(k1) if hasattr(lat, "sample") else lat
        image_latents = (lat - mean) * inv_std
        min_frames = (num_latent_frames_per_chunk - 1) * self.vae_scale_factor_temporal + 1
        fake_video = jnp.tile(img, (1, 1, min_frames, 1, 1))
        fl = vae.encode(vae_params, fake_video)
        fl = fl.sample(k2) if hasattr(fl, "sample") else fl
        fake_latents = ((fl - mean) * inv_std)[:, :, -1:]
        return image_latents, fake_latents

    def _denoise(self, t_params, latents, hist_short, hist_mid, hist_long,
                 idx_cur, idx_short, idx_mid, idx_long, embeds, neg_embeds,
                 timesteps, state, guidance_scale, do_cfg):
        transformer = self.transformer[0]
        from ...hooks.generic_cache import denoise_scan

        def forward(lat, t, sstate):
            if do_cfg:
                lat_in = jnp.concatenate([lat, lat], axis=0)
                hs = jnp.concatenate([hist_short, hist_short], axis=0)
                hm = jnp.concatenate([hist_mid, hist_mid], axis=0)
                hl = jnp.concatenate([hist_long, hist_long], axis=0)
                two = lambda ix: jnp.concatenate([ix, ix], axis=0)
                tt = jnp.broadcast_to(t, (lat_in.shape[0],)).astype(lat.dtype)
                pred = transformer(
                    t_params, lat_in, tt, jnp.concatenate([embeds, neg_embeds]),
                    indices_hidden_states=two(idx_cur),
                    indices_latents_history_short=two(idx_short),
                    indices_latents_history_mid=two(idx_mid),
                    indices_latents_history_long=two(idx_long),
                    latents_history_short=hs, latents_history_mid=hm, latents_history_long=hl,
                ).sample
                cond, uncond = jnp.split(pred, 2, axis=0)
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

        return denoise_scan(forward, self.scheduler, latents, state, timesteps,
                            getattr(self, "_cache_config", None), pipe=self)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 384,
        width: int = 640,
        num_frames: int = 132,
        num_inference_steps: int = 50,
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
        callback_on_step_end=None,
        callback_on_step_end_tensor_inputs=None,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        history_sizes = list(history_sizes) if history_sizes is not None else [16, 2, 1]
        num_frames = max(num_frames, 1)

        do_cfg = guidance_scale > 1.0
        embeds, neg_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = embeds.shape[0]
        mean, inv_std = self._latent_stats()

        # 4. image conditioning (reference `:663`)
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

        # 5. rolling history buffer (reference `:786`)
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

        # fixed relative frame indices (reference `:806-833`)
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
        image_seq_len = num_latent_frames_per_chunk * lh * lw // (patch[0] * patch[1] * patch[2])
        if sigmas is None:
            sigmas = np.linspace(0.999, 0.0, num_inference_steps + 1)[:-1]
        mu = calculate_shift(
            image_seq_len,
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )

        denoise = self._denoise_entry("denoise",
            partial(self._denoise, guidance_scale=float(guidance_scale), do_cfg=do_cfg), callback_on_step_end,
            static=(float(guidance_scale), do_cfg))
        decode = self._jit(
            "decode", lambda p, z: vae.decode(p, z / inv_std + mean).sample)

        history_video = None
        real_history_latents = None
        for k_chunk in range(num_latent_chunk):
            tail = history_latents[:, :, -num_history_latent_frames:]
            if keep_first_frame:
                c0, c1 = history_sizes[0], history_sizes[0] + history_sizes[1]
                hist_long, hist_mid, hist_1x = tail[:, :, :c0], tail[:, :, c0:c1], tail[:, :, c1:]
                if image_latents is None and k_chunk == 0:
                    prefix = jnp.zeros((batch_size, num_channels_latents, 1, lh, lw), jnp.float32)
                else:
                    prefix = image_latents
                hist_short = jnp.concatenate([prefix, hist_1x], axis=2)
            else:
                c0, c1 = history_sizes[0], history_sizes[0] + history_sizes[1]
                hist_long, hist_mid, hist_short = tail[:, :, :c0], tail[:, :, c0:c1], tail[:, :, c1:]

            key, lat_key = jax.random.split(key)
            latents = randn_tensor(
                (batch_size, num_channels_latents, num_latent_frames_per_chunk, lh, lw), key=lat_key)
            try:
                state = self.scheduler.set_timesteps(
                    num_inference_steps, sigmas=np.asarray(sigmas), mu=mu,
                    sample_shape=latents.shape)
            except (TypeError, ValueError):
                state = self.scheduler.set_timesteps(num_inference_steps)

            latents = denoise(t_params, latents, hist_short, hist_mid, hist_long,
                              idx_cur, idx_short, idx_mid, idx_long, embeds, neg_embeds,
                              state.timesteps, state)

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
