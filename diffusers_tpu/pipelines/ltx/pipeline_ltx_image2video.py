"""LTX-Video image-to-video pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/ltx/pipeline_ltx_image2video.py`):
the first latent frame is the VAE-encoded input image (normalized), the
conditioning mask zeroes its per-token timestep (`:841`) and freezes it
across scheduler steps (`:887-891`). TPU-first: the freeze is a packed-token
select inside the single scanned jit (equivalent to the reference's
unpack/step/repack because the flow-match Euler step is elementwise).
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...guiders.guider_utils import rescale_noise_cfg
from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils import logging
from ...utils.jax_utils import randn_tensor
from .pipeline_ltx import LTXPipeline, LTXPipelineOutput

logger = logging.get_logger(__name__)


class LTXImageToVideoPipeline(LTXPipeline):
    @staticmethod
    def _normalize_latents(latents, latents_mean, latents_std, scaling_factor: float = 1.0):
        mean = latents_mean.reshape(1, -1, 1, 1, 1).astype(latents.dtype)
        std = latents_std.reshape(1, -1, 1, 1, 1).astype(latents.dtype)
        return (latents - mean) * scaling_factor / std

    def _denoise_i2v(self, t_params, latents, cond_mask, prompt_embeds, prompt_mask,
                     rope_cos, rope_sin, timesteps, state, guidance_scale,
                     guidance_rescale, do_cfg):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            mask_input = jnp.concatenate([cond_mask, cond_mask], axis=0) if do_cfg else cond_mask
            # conditioned tokens run at timestep 0 (reference `:841`)
            timestep = t * (1.0 - mask_input)
            noise_pred = transformer(
                t_params, latent_input, prompt_embeds, timestep,
                encoder_attention_mask=prompt_mask,
                image_rotary_emb=(rope_cos, rope_sin),
            ).sample.astype(jnp.float32)
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
                if guidance_rescale > 0:
                    noise_pred = rescale_noise_cfg(noise_pred, text, guidance_rescale)
            out = scheduler.step(sstate, noise_pred, t, latents)
            keep = cond_mask[..., None]
            new_latents = keep * latents + (1.0 - keep) * out.prev_sample
            return (new_latents, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        image=None,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 512,
        width: int = 704,
        num_frames: int = 161,
        frame_rate: int = 25,
        num_inference_steps: int = 50,
        guidance_scale: float = 3.0,
        guidance_rescale: float = 0.0,
        key: Optional[jax.Array] = None,
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
        key, enc_key, latents_key, decode_key = jax.random.split(key, 4)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, prompt_attention_mask, neg_embeds, neg_mask = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length
        )
        batch_size = prompt_embeds.shape[0]
        if do_cfg:
            embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            mask = jnp.concatenate([neg_mask, prompt_attention_mask], axis=0)
        else:
            embeds, mask = prompt_embeds, prompt_attention_mask

        latent_num_frames = (num_frames - 1) // self.vae_temporal_compression_ratio + 1
        latent_height = height // self.vae_spatial_compression_ratio
        latent_width = width // self.vae_spatial_compression_ratio
        num_channels_latents = transformer.config.in_channels
        p, pt = self.transformer_spatial_patch_size, self.transformer_temporal_patch_size

        # first-frame VAE condition, broadcast over frames (reference `:541-557`)
        from ...image_processor import VaeImageProcessor

        init = jnp.asarray(VaeImageProcessor(vae_scale_factor=self.vae_spatial_compression_ratio)
                           .preprocess(image, height, width))
        init_latents = vae.encode(vae_params, init[:, :, None]).latent_dist.sample(enc_key)
        init_latents = self._normalize_latents(
            init_latents, vae_params["latents_mean"], vae_params["latents_std"], vae.config.scaling_factor
        )
        init_latents = jnp.broadcast_to(
            init_latents[:, :, :1],
            (batch_size, num_channels_latents, latent_num_frames, latent_height, latent_width),
        )
        cond_mask_5d = jnp.zeros((batch_size, 1, latent_num_frames, latent_height, latent_width))
        cond_mask_5d = cond_mask_5d.at[:, :, 0].set(1.0)
        noise = randn_tensor(init_latents.shape, key=latents_key)
        latents = init_latents * cond_mask_5d + noise * (1 - cond_mask_5d)
        latents = self._pack_latents(latents, p, pt)
        cond_mask = self._pack_latents(cond_mask_5d, p, pt)[..., 0]

        grid = transformer.rope.prepare_video_coords(
            batch_size * (2 if do_cfg else 1),
            latent_num_frames // pt, latent_height // p, latent_width // p,
            rope_interpolation_scale=(
                self.vae_temporal_compression_ratio / frame_rate,
                self.vae_spatial_compression_ratio,
                self.vae_spatial_compression_ratio,
            ),
        )
        rope_cos, rope_sin = transformer.rope({}, grid)

        video_seq_len = latents.shape[1]
        sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        mu = calculate_shift(
            video_seq_len,
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        if self.scheduler.config.get("use_dynamic_shifting", False):
            state = self.scheduler.set_timesteps(sigmas=list(sigmas), mu=mu)
        else:
            state = self.scheduler.set_timesteps(num_inference_steps)

        denoise = self._jit(
            "denoise_i2v",
            lambda *a: self._denoise_i2v(*a, guidance_scale, guidance_rescale, do_cfg),
            static=(guidance_scale, guidance_rescale, do_cfg),
        )
        latents = denoise(t_params, latents, cond_mask, embeds, mask, rope_cos, rope_sin,
                          state.timesteps, state)

        if output_type == "latent":
            video = latents
        else:
            latents = self._unpack_latents(
                latents, latent_num_frames // pt, latent_height // p, latent_width // p, p, pt
            )
            latents = self._denormalize_latents(
                latents, vae_params["latents_mean"], vae_params["latents_std"], vae.config.scaling_factor
            )
            temb = None
            if vae.config.timestep_conditioning:
                dnoise = randn_tensor(latents.shape, key=decode_key, dtype=latents.dtype)
                scale = decode_timestep if decode_noise_scale is None else decode_noise_scale
                latents = (1 - scale) * latents + scale * dnoise
                temb = jnp.full((latents.shape[0],), decode_timestep, latents.dtype)
            decode = self._jit(
                "decode",
                lambda pp, z, tt, kk: vae.decode(pp, z, tt, key=kk).sample,
                static=(vae.config.timestep_conditioning,),
            )
            video = decode(vae_params, latents, temb, decode_key)
            video = np.asarray(jnp.transpose(jnp.clip(video / 2 + 0.5, 0, 1), (0, 2, 3, 4, 1)))

        if not return_dict:
            return (video,)
        return LTXPipelineOutput(frames=video)
