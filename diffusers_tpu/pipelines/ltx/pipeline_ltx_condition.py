"""LTX condition pipeline (LTX-0.9.5 multi-conditioning).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/ltx/pipeline_ltx_condition.py:148`
LTXConditionPipeline): image/video conditions are VAE-encoded, lerped into
the noise at their latent frame positions with per-frame strength
(`prepare_latents` `:672-817`); conditions at nonzero `frame_index`
additionally contribute extra prefix tokens with their own RoPE video ids
(`_scale_video_ids` `:553-568`). Each denoise step clamps the per-token
timestep to `(1 - conditioning_mask) * 1000` (`:1201`), runs a per-token
Euler step (`scheduling_flow_match_euler_discrete.py:486`), and only updates
tokens whose noise level is at or above the current step (`:1228`).
Optional per-step stochastic re-noising of hard-conditioned tokens
(`add_noise_to_image_conditioning_latents` `:647`), linear-quadratic default
sigmas (`:118`), strength-truncated schedule for latents-to-latents
(`get_timesteps` `:818`).

TPU-first: all condition packing/ids happen host-side with static shapes;
the denoise loop is ONE jitted `lax.scan` whose xs carry (t, per-step noise
key); the per-token scheduler step vectorizes the reference's
grid-sigma search as a masked max over the [n+1] sigma ladder.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.jax_utils import randn_tensor
from ..mochi.pipeline_mochi import linear_quadratic_schedule
from ..pipeline_utils import DiffusionPipeline
from .pipeline_ltx import LTXPipeline, LTXPipelineOutput


@dataclass
class LTXVideoCondition:
    """One conditioning item (reference `:96`): an image or a video placed at
    `frame_index` with blend `strength`."""

    image: Any = None
    video: Any = None
    frame_index: int = 0
    strength: float = 1.0


class LTXConditionPipeline(LTXPipeline):
    _supported_cache_configs = ()

    def __init__(self, scheduler, vae, text_encoder, tokenizer, transformer):
        super().__init__(scheduler=scheduler, vae=vae, text_encoder=text_encoder,
                         tokenizer=tokenizer, transformer=transformer)
        from ...video_processor import VideoProcessor

        self.video_processor = VideoProcessor(vae_scale_factor=self.vae_spatial_compression_ratio)

    @staticmethod
    def _prepare_video_ids(batch_size, num_frames, height, width, patch_size=1, patch_size_t=1):
        gf, gh, gw = np.meshgrid(
            np.arange(0, num_frames, patch_size_t),
            np.arange(0, height, patch_size),
            np.arange(0, width, patch_size),
            indexing="ij",
        )
        coords = np.stack([gf, gh, gw], axis=0).reshape(3, -1)
        return np.broadcast_to(coords[None], (batch_size, 3, coords.shape[-1])).astype(np.float32).copy()

    @staticmethod
    def _scale_video_ids(video_ids, scale_factor=32, scale_factor_t=8, frame_index=0):
        scaled = video_ids * np.array([scale_factor_t, scale_factor, scale_factor],
                                      dtype=np.float32)[None, :, None]
        scaled[:, 0] = np.clip(scaled[:, 0] + 1 - scale_factor_t, 0, None)
        scaled[:, 0] += frame_index
        return scaled

    def trim_conditioning_sequence(self, start_frame: int, sequence_num_frames: int,
                                   target_num_frames: int) -> int:
        """Clip a condition video so it ends inside the output and keeps the
        k*ratio+1 form (reference `:629-645`)."""
        scale = self.vae_temporal_compression_ratio
        num_frames = min(sequence_num_frames, target_num_frames - start_frame)
        return (num_frames - 1) // scale * scale + 1

    def _encode_condition(self, tensor, enc_key):
        vae, vae_params = self.vae
        lat = vae.encode(vae_params, jnp.asarray(tensor, jnp.float32)).latent_dist.sample(enc_key)
        return self._normalize_latents(lat, vae_params["latents_mean"], vae_params["latents_std"],
                                       vae.config.scaling_factor)

    def _denoise_condition(self, t_params, latents, init_latents, conditioning_mask, embeds,
                           mask, video_coords, timesteps, noise_keys, state,
                           guidance_scale, do_cfg, image_cond_noise_scale):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        has_cond = conditioning_mask is not None

        def step_fn(carry, xs):
            t, nk = xs
            latents, sstate = carry

            if has_cond and image_cond_noise_scale > 0:
                # re-noise hard-conditioned tokens (reference `:647-670`)
                noise = randn_tensor(latents.shape, key=nk, dtype=latents.dtype)
                hard = (conditioning_mask > 1.0 - 1e-6)[..., None]
                noised = init_latents + image_cond_noise_scale * noise * (t / 1000.0) ** 2
                lat = jnp.where(hard, noised, latents)
            else:
                lat = latents

            latent_in = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
            tt = jnp.broadcast_to(t, (latent_in.shape[0], 1)).astype(jnp.float32)
            if has_cond:
                cmask = jnp.concatenate([conditioning_mask] * 2, axis=0) if do_cfg else conditioning_mask
                tt = jnp.minimum(tt, (1.0 - cmask) * 1000.0)

            noise_pred = transformer(
                t_params, latent_in, embeds, tt,
                encoder_attention_mask=mask, video_coords=video_coords,
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
                tt = tt[: lat.shape[0]]

            # Our scheduler uses prev = sample + (sigma_next - sigma) * v in BOTH
            # branches (scheduling_flow_match_euler_discrete.py:205), so the raw
            # velocity is passed un-negated. (The reference negates at
            # `pipeline_ltx_condition.py:1000` only because its per-token branch
            # defines dt = sigma - sigma_next, cancelling the negation.)
            denoised = scheduler.step(sstate, noise_pred, t, lat,
                                      per_token_timesteps=tt if has_cond else None).prev_sample
            if has_cond:
                to_denoise = ((t / 1000.0 - 1e-6) < (1.0 - conditioning_mask))[..., None]
                new_latents = jnp.where(to_denoise, denoised, lat)
            else:
                new_latents = denoised
            return (new_latents, sstate), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (timesteps, noise_keys))
        return latents

    def __call__(
        self,
        conditions: Optional[Union[LTXVideoCondition, List[LTXVideoCondition]]] = None,
        image=None,
        video=None,
        frame_index: Union[int, List[int]] = 0,
        strength: Union[float, List[float]] = 1.0,
        denoise_strength: float = 1.0,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 512,
        width: int = 704,
        num_frames: int = 161,
        frame_rate: int = 25,
        num_inference_steps: int = 50,
        timesteps: Optional[List[float]] = None,
        guidance_scale: float = 3.0,
        image_cond_noise_scale: float = 0.15,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        decode_timestep: float = 0.0,
        decode_noise_scale: Optional[float] = None,
        max_sequence_length: int = 128,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        if not 0 <= denoise_strength <= 1:
            raise ValueError(f"denoise_strength must be in [0, 1], got {denoise_strength}")
        key, lat_key, decode_key = jax.random.split(key, 3)

        # -------- conditions normalization (reference `:1056-1106`)
        if conditions is not None:
            if not isinstance(conditions, list):
                conditions = [conditions]
            cond_images = [c.image for c in conditions]
            cond_videos = [c.video for c in conditions]
            frame_index = [c.frame_index for c in conditions]
            strength = [c.strength for c in conditions]
        elif image is not None or video is not None:
            cond_images = image if isinstance(image, list) else ([image] if image is not None else [])
            cond_videos = video if isinstance(video, list) else ([video] if video is not None else [])
            n = max(len(cond_images), len(cond_videos))
            cond_images = cond_images or [None] * n
            cond_videos = cond_videos or [None] * n
            frame_index = frame_index if isinstance(frame_index, list) else [frame_index] * n
            strength = strength if isinstance(strength, list) else [strength] * n
        else:
            cond_images, cond_videos, frame_index, strength = [], [], [], []

        do_cfg = guidance_scale > 1.0
        prompt_embeds, prompt_attention_mask, neg_embeds, neg_mask = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = prompt_embeds.shape[0]
        if do_cfg:
            embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            mask = jnp.concatenate([neg_mask, prompt_attention_mask], axis=0)
        else:
            embeds, mask = prompt_embeds, prompt_attention_mask

        # -------- condition tensors (pixel space)
        conditioning_tensors = []
        for img, vid, fi in zip(cond_images, cond_videos, frame_index):
            if img is not None:
                t_in = self.video_processor.preprocess(img, height=height, width=width)
                t_in = np.asarray(t_in)[:, :, None] if t_in.ndim == 4 else np.asarray(t_in)
            elif vid is not None:
                t_in = np.asarray(self.video_processor.preprocess_video(vid, height=height, width=width))
                keep = self.trim_conditioning_sequence(fi, t_in.shape[2], num_frames)
                t_in = t_in[:, :, :keep]
            else:
                raise ValueError("Each condition needs `image` or `video`.")
            if t_in.shape[2] % self.vae_temporal_compression_ratio != 1:
                raise ValueError(
                    f"Condition frames must be k*{self.vae_temporal_compression_ratio}+1, got {t_in.shape[2]}")
            conditioning_tensors.append(t_in)
        has_cond = len(conditioning_tensors) > 0

        # -------- schedule (linear-quadratic default, reference `:1113`)
        latent_num_frames = (num_frames - 1) // self.vae_temporal_compression_ratio + 1
        latent_height = height // self.vae_spatial_compression_ratio
        latent_width = width // self.vae_spatial_compression_ratio
        p, pt = self.transformer_spatial_patch_size, self.transformer_temporal_patch_size

        if timesteps is None:
            sched_sigmas = np.asarray(linear_quadratic_schedule(num_inference_steps, 0.025))
            timesteps = sched_sigmas * 1000.0
        state = self.scheduler.set_timesteps(timesteps=list(np.asarray(timesteps)))

        sched_timesteps = state.timesteps
        latent_sigma = None
        if denoise_strength < 1:
            num_steps = min(int(num_inference_steps * denoise_strength), num_inference_steps)
            start = max(num_inference_steps - num_steps, 0)
            sched_timesteps = sched_timesteps[start:]
            latent_sigma = state.sigmas[start]

        # -------- latents + condition injection (host-side, static shapes)
        shape = (batch_size, transformer.config.in_channels, latent_num_frames,
                 latent_height, latent_width)
        key, noise_key = jax.random.split(key)
        noise = randn_tensor(shape, key=noise_key)
        if latents is not None and latent_sigma is not None:
            base = latent_sigma * noise + (1 - latent_sigma) * jnp.asarray(latents, jnp.float32)
        elif latents is not None:
            base = jnp.asarray(latents, jnp.float32)
        else:
            base = noise

        cond_frames_mask = np.zeros((batch_size, latent_num_frames), np.float32)
        extra_latents, extra_ids, extra_masks = [], [], []
        for tensor, s, fi in zip(conditioning_tensors, strength, frame_index):
            key, enc_key, cn_key = jax.random.split(key, 3)
            cond_lat = self._encode_condition(tensor, enc_key)
            if cond_lat.shape[0] < batch_size:
                cond_lat = jnp.repeat(cond_lat, batch_size // cond_lat.shape[0], axis=0)
            ncf = cond_lat.shape[2]
            if fi == 0:
                base = base.at[:, :, :ncf].set(
                    base[:, :, :ncf] + s * (cond_lat - base[:, :, :ncf]))
                cond_frames_mask[:, :ncf] = s
            else:
                n_prefix = 2
                if tensor.shape[2] > 1:
                    if ncf < n_prefix:
                        raise ValueError(f"Condition video needs >= {n_prefix} latent frames, got {ncf}")
                    if ncf > n_prefix:
                        sf = fi // self.vae_temporal_compression_ratio + n_prefix
                        ef = sf + ncf - n_prefix
                        base = base.at[:, :, sf:ef].set(
                            base[:, :, sf:ef] + s * (cond_lat[:, :, n_prefix:] - base[:, :, sf:ef]))
                        cond_frames_mask[:, sf:ef] = s
                        cond_lat = cond_lat[:, :, :n_prefix]
                cnoise = randn_tensor(cond_lat.shape, key=cn_key)
                cond_lat = cnoise + s * (cond_lat - cnoise)
                ids = self._prepare_video_ids(batch_size, cond_lat.shape[2], latent_height,
                                              latent_width, patch_size=p, patch_size_t=pt)
                ids = self._scale_video_ids(ids, self.vae_spatial_compression_ratio,
                                            self.vae_temporal_compression_ratio, frame_index=fi)
                packed = self._pack_latents(cond_lat, p, pt)
                extra_latents.append(packed)
                extra_ids.append(ids)
                extra_masks.append(np.full((batch_size, packed.shape[1]), s, np.float32))

        video_ids = self._prepare_video_ids(batch_size, latent_num_frames, latent_height,
                                            latent_width, patch_size=p, patch_size_t=pt)
        conditioning_mask = None
        if has_cond:
            conditioning_mask = np.take_along_axis(
                cond_frames_mask, video_ids[:, 0].astype(np.int64), axis=1)
        video_ids = self._scale_video_ids(video_ids, self.vae_spatial_compression_ratio,
                                          self.vae_temporal_compression_ratio, frame_index=0)
        packed_latents = self._pack_latents(base, p, pt)

        extra_num = 0
        if extra_latents:
            extra_num = int(sum(e.shape[1] for e in extra_latents))
            packed_latents = jnp.concatenate([*extra_latents, packed_latents], axis=1)
            video_ids = np.concatenate([*extra_ids, video_ids], axis=2)
            conditioning_mask = np.concatenate([*extra_masks, conditioning_mask], axis=1)

        video_coords = video_ids.astype(np.float32)
        video_coords[:, 0] *= 1.0 / frame_rate
        if do_cfg:
            video_coords = np.concatenate([video_coords, video_coords], axis=0)

        init_latents = packed_latents if has_cond else None
        n_steps = sched_timesteps.shape[0]
        key, scan_key = jax.random.split(key)
        noise_keys = jax.random.split(scan_key, n_steps)

        denoise = self._jit(
            "denoise_cond",
            lambda *a: self._denoise_condition(
                *a, guidance_scale=guidance_scale, do_cfg=do_cfg,
                image_cond_noise_scale=float(image_cond_noise_scale)),
            static=(guidance_scale, do_cfg, float(image_cond_noise_scale), has_cond),
        )
        latents_out = denoise(
            t_params, packed_latents, init_latents,
            jnp.asarray(conditioning_mask) if has_cond else None,
            embeds, mask, jnp.asarray(video_coords), sched_timesteps, noise_keys, state,
        )

        if extra_num:
            latents_out = latents_out[:, extra_num:]
        latents_out = self._unpack_latents(latents_out, latent_num_frames // pt,
                                           latent_height // p, latent_width // p, p, pt)

        if output_type == "latent":
            video_out = latents_out
        else:
            lat = self._denormalize_latents(
                latents_out, vae_params["latents_mean"], vae_params["latents_std"],
                vae.config.scaling_factor)
            temb = None
            if vae.config.timestep_conditioning:
                dnoise = randn_tensor(lat.shape, key=decode_key, dtype=lat.dtype)
                scale = decode_timestep if decode_noise_scale is None else decode_noise_scale
                lat = (1 - scale) * lat + scale * dnoise
                temb = jnp.full((lat.shape[0],), decode_timestep, lat.dtype)
            decode = self._jit(
                "decode",
                lambda pp, z, tt, kk: vae.decode(pp, z, tt, key=kk).sample,
                static=(vae.config.timestep_conditioning,),
            )
            video_out = decode(vae_params, lat, temb, decode_key)
            video_out = np.asarray(jnp.transpose(jnp.clip(video_out / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video_out,)
        return LTXPipelineOutput(frames=video_out)
