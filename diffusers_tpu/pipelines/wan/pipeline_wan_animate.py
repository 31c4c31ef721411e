"""Wan-Animate pipeline (character animation / replacement).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/wan/pipeline_wan_animate.py:150`
WanAnimatePipeline): the video is generated in `segment_frame_length`-frame
segments; each segment's transformer input stacks [noisy latents,
reference-image latents + I2V mask, previous-segment conditioning latents +
mask] on the channel/frame axes (`:1109`), conditioned on CLIP image embeds
(penultimate hidden state, `:277`), VAE-encoded pose latents, and the face
video through the motion/face encoders. Replace mode conditions on the
background video with an inverted nearest-resized mask (`:629-646`). CFG
blanks the face frames to -1 (`:1127`). Decoded segments drop the reference
frame and the prev-segment conditioning frames (`:1175-1180`); videos are
reflect-padded to a whole number of segments (`pad_video_frames` `:715`).

TPU-first: face motion tokens are encoded ONCE per segment
(`transformer.encode_face_motion`) and ride the scanned jitted denoise loop
as constants — every segment shares one compiled scan (static shapes).
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.jax_utils import randn_tensor
from ...video_processor import VideoProcessor
from .pipeline_wan import WanPipeline, WanPipelineOutput


class WanAnimatePipeline(WanPipeline):
    _supported_cache_configs = ()

    def __init__(self, tokenizer, text_encoder, transformer, vae, scheduler,
                 image_encoder=None, image_processor=None):
        super().__init__(tokenizer=tokenizer, text_encoder=text_encoder,
                         transformer=transformer, vae=vae, scheduler=scheduler)
        self.register_modules(image_encoder=image_encoder, image_processor=image_processor)
        self.video_processor = VideoProcessor(vae_scale_factor=self.vae_scale_factor_spatial)

    # ------------------------------------------------------------- helpers
    def encode_image(self, image) -> jax.Array:
        """CLIP-vision penultimate hidden state (reference `:277-285`)."""
        image_encoder, ie_params = self.image_encoder
        if self.image_processor is not None:
            pixel_values = np.asarray(self.image_processor(images=image, return_tensors="np")["pixel_values"])
        else:
            pixel_values = np.asarray(image, np.float32)
        out = image_encoder(ie_params, jnp.asarray(pixel_values), output_hidden_states=True)
        return out.hidden_states[-2]

    def _normalize_latents(self, lat: jax.Array) -> jax.Array:
        vae = self.vae[0]
        mean = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1, 1)
        std = jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1, 1)
        return (lat - mean) / std

    def _encode_video_latents(self, video: jax.Array) -> jax.Array:
        vae, vae_params = self.vae
        return self._normalize_latents(vae.encode(vae_params, video).mode())

    def get_i2v_mask(self, batch_size, latent_t, latent_h, latent_w, mask_len=1,
                     mask_pixel_values=None):
        """I2V conditioning mask folded to latent channels (reference `:459-487`)."""
        if mask_pixel_values is None:
            mask = np.zeros((batch_size, 1, (latent_t - 1) * self.vae_scale_factor_temporal + 1,
                             latent_h, latent_w), np.float32)
        else:
            mask = np.array(mask_pixel_values, np.float32)
        mask[:, :, :mask_len] = 1
        first = np.repeat(mask[:, :, 0:1], self.vae_scale_factor_temporal, axis=2)
        mask = np.concatenate([first, mask[:, :, 1:]], axis=2)
        mask = mask.reshape(batch_size, -1, self.vae_scale_factor_temporal, latent_h, latent_w)
        return jnp.asarray(mask.transpose(0, 2, 1, 3, 4))  # [B, 4, T_lat, H, W]

    @staticmethod
    def pad_video_frames(frames, num_target_frames):
        """Reflect-style frame padding (reference `:715`)."""
        idx, flip, out = 0, False, []
        while len(out) < num_target_frames:
            out.append(frames[idx])
            idx = idx - 1 if flip else idx + 1
            if idx == 0 or idx == len(frames) - 1:
                flip = not flip
        return out

    # ------------------------------------------------------------- denoise
    def _denoise_segment(self, t_params, latents, reference_latents, pose_latents,
                         motion_vec, motion_vec_uncond, prompt_embeds, negative_embeds,
                         image_embeds, timesteps, state, guidance_scale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_in = jnp.concatenate([latents, reference_latents], axis=1)
            timestep = jnp.broadcast_to(t, (latents.shape[0],))
            noise_pred = transformer(
                t_params, latent_in, timestep, prompt_embeds,
                encoder_hidden_states_image=image_embeds,
                pose_hidden_states=pose_latents, motion_vec=motion_vec,
            ).sample
            if do_cfg:
                noise_uncond = transformer(
                    t_params, latent_in, timestep, negative_embeds,
                    encoder_hidden_states_image=image_embeds,
                    pose_hidden_states=pose_latents, motion_vec=motion_vec_uncond,
                ).sample
                noise_pred = noise_uncond + guidance_scale * (noise_pred - noise_uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    # ------------------------------------------------------------- __call__
    def __call__(
        self,
        image=None,
        pose_video=None,
        face_video=None,
        background_video=None,
        mask_video=None,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 720,
        width: int = 1280,
        segment_frame_length: int = 77,
        prev_segment_conditioning_frames: int = 1,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        mode: str = "animate",
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        image_embeds: Optional[jax.Array] = None,
        max_sequence_length: int = 226,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        if mode not in ("animate", "replace"):
            raise ValueError(f"mode must be 'animate' or 'replace', got {mode!r}")
        if mode == "replace" and (background_video is None or mask_video is None):
            raise ValueError("replace mode requires background_video and mask_video")

        rt = self.vae_scale_factor_temporal
        if segment_frame_length % rt != 1:
            segment_frame_length = max(segment_frame_length // rt * rt + 1, 1)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length)
        batch_size = prompt_embeds.shape[0]

        # segment geometry (reference `:938-950`)
        cond_video_frames = len(pose_video) if isinstance(pose_video, list) else np.asarray(pose_video).shape[2]
        effective = segment_frame_length - prev_segment_conditioning_frames
        last = (cond_video_frames - prev_segment_conditioning_frames) % effective
        num_target_frames = cond_video_frames + (0 if last == 0 else effective - last)
        num_segments = num_target_frames // effective

        # character image → CLIP embeds + reference latents
        img = jnp.asarray(self.video_processor.preprocess(image, height=height, width=width), jnp.float32)
        if image_embeds is None:
            image_embeds = self.encode_image(image)
        image_embeds = jnp.broadcast_to(image_embeds, (batch_size, *image_embeds.shape[1:]))

        def to_video(v, h, w):
            if isinstance(v, (list, tuple)):
                return jnp.asarray(self.video_processor.preprocess_video(v, height=h, width=w), jnp.float32)
            return jnp.asarray(v, jnp.float32)

        face_size = transformer.config.motion_encoder_size
        pose_frames = self.pad_video_frames(list(pose_video) if isinstance(pose_video, (list, tuple))
                                            else list(np.moveaxis(np.asarray(pose_video)[0], 1, 0)),
                                            num_target_frames)
        face_frames = self.pad_video_frames(list(face_video) if isinstance(face_video, (list, tuple))
                                            else list(np.moveaxis(np.asarray(face_video)[0], 1, 0)),
                                            num_target_frames)
        pose = to_video(pose_frames, height, width)
        face = to_video(face_frames, face_size, face_size)
        if mode == "replace":
            bg_frames = self.pad_video_frames(list(background_video), num_target_frames)
            mk_frames = self.pad_video_frames(list(mask_video), num_target_frames)
            background = to_video(bg_frames, height, width)
            mask = jnp.asarray(self.video_processor.preprocess_video(mk_frames, height=height, width=width),
                               jnp.float32)
            mask = (mask[:, :1] + 1) / 2  # [-1,1] → [0,1], single channel
        else:
            background = mask = None

        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        num_latent_frames = (segment_frame_length - 1) // rt + 1
        num_channels_latents = vae.config.z_dim

        # reference image latents + I2V mask (frame dim = 1)
        ref_lat = self._encode_video_latents(img[:, :, None] if img.ndim == 4 else img)
        if ref_lat.shape[0] < batch_size:
            ref_lat = jnp.repeat(ref_lat, batch_size // ref_lat.shape[0], axis=0)
        ref_mask = self.get_i2v_mask(batch_size, 1, lh, lw, 1, None)
        reference_image_latents = jnp.concatenate([ref_mask, ref_lat], axis=1)

        denoise = self._jit(
            "denoise_segment",
            lambda *a: self._denoise_segment(*a, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg),
        )
        decode = self._jit("decode", lambda p, z: vae.decode(p, z).sample)

        all_out = []
        start, end = 0, segment_frame_length
        prev_cond_video = None
        for seg in range(num_segments):
            key, lat_key = jax.random.split(key)
            if seg == 0 and latents is not None:
                seg_latents = jnp.asarray(latents)
            else:
                seg_latents = randn_tensor(
                    (batch_size, num_channels_latents, num_latent_frames + 1, lh, lw), key=lat_key)

            pose_seg = pose[:, :, start:end]
            face_seg = face[:, :, start:end]
            if face_seg.shape[0] < batch_size:
                face_seg = jnp.repeat(face_seg, batch_size // face_seg.shape[0], axis=0)

            bg_seg = mask_seg = None
            if mode == "replace":
                bg_seg = background[:, :, start:end]
                mask_seg = mask[:, :, start:end]
                if bg_seg.shape[0] < batch_size:
                    bg_seg = jnp.repeat(bg_seg, batch_size // bg_seg.shape[0], axis=0)
                    mask_seg = jnp.repeat(mask_seg, batch_size // mask_seg.shape[0], axis=0)

            pose_latents = self._encode_video_latents(pose_seg)
            if pose_latents.shape[0] < batch_size:
                pose_latents = jnp.repeat(pose_latents, batch_size // pose_latents.shape[0], axis=0)

            # previous-segment conditioning video (reference `:560-651`)
            if prev_cond_video is None:
                if mode == "replace":
                    prev = bg_seg[:, :, :prev_segment_conditioning_frames]
                else:
                    prev = jnp.zeros((batch_size, 3, prev_segment_conditioning_frames, height, width))
            else:
                prev = prev_cond_video
            if mode == "replace":
                remaining = bg_seg[:, :, prev_segment_conditioning_frames:]
            else:
                remaining = jnp.zeros(
                    (batch_size, 3, segment_frame_length - prev_segment_conditioning_frames, height, width))
            full_cond_video = jnp.concatenate([prev, remaining], axis=2)
            prev_cond_latents = self._encode_video_latents(full_cond_video)
            if prev_cond_latents.shape[0] < batch_size:
                prev_cond_latents = jnp.repeat(prev_cond_latents, batch_size // prev_cond_latents.shape[0], axis=0)

            if mode == "replace":
                inv = 1 - mask_seg  # [B, 1, T, H, W]
                inv = jax.image.resize(inv, (inv.shape[0], 1, inv.shape[2], lh, lw), method="nearest")
                mask_pixel_values = np.asarray(inv)
            else:
                mask_pixel_values = None
            prev_mask = self.get_i2v_mask(
                batch_size, num_latent_frames, lh, lw,
                mask_len=prev_segment_conditioning_frames if start > 0 else 0,
                mask_pixel_values=mask_pixel_values)
            prev_cond_latents = jnp.concatenate([prev_mask, prev_cond_latents], axis=1)

            reference_latents = jnp.concatenate([reference_image_latents, prev_cond_latents], axis=2)

            motion_vec = transformer.encode_face_motion(t_params, face_seg)
            motion_vec_uncond = (
                transformer.encode_face_motion(t_params, face_seg * 0 - 1) if do_cfg else None
            )

            try:
                state = self.scheduler.set_timesteps(num_inference_steps, sample_shape=seg_latents.shape)
            except TypeError:
                state = self.scheduler.set_timesteps(num_inference_steps)

            seg_latents = denoise(
                t_params, seg_latents, reference_latents, pose_latents, motion_vec,
                motion_vec_uncond, prompt_embeds, negative_embeds, image_embeds,
                state.timesteps, state)

            mean = jnp.asarray(vae.config.latents_mean).reshape(1, -1, 1, 1, 1)
            std = jnp.asarray(vae.config.latents_std).reshape(1, -1, 1, 1, 1)
            out_lat = seg_latents * std + mean
            out_frames = decode(vae_params, out_lat[:, :, 1:])  # drop reference frame
            if start > 0:
                out_frames = out_frames[:, :, prev_segment_conditioning_frames:]
            all_out.append(np.asarray(out_frames))

            prev_cond_video = jnp.asarray(all_out[-1][:, :, -prev_segment_conditioning_frames:])
            start += effective
            end += effective

        if output_type == "latent":
            video = seg_latents
        else:
            video = np.concatenate(all_out, axis=2)[:, :, :cond_video_frames]
            video = np.transpose(np.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1))

        if not return_dict:
            return (video,)
        return WanPipelineOutput(frames=video)
