"""Z-Image image-to-image and inpainting pipelines.

Behavioral mirrors of the reference
(`/root/reference/src/diffusers/pipelines/z_image/pipeline_z_image_img2img.py:154`
ZImageImg2ImgPipeline — VAE-encode the input, strength-truncated schedule
(`get_timesteps` `:285`), `scale_noise` init (`:345`), then the base CFG
denoise; `pipeline_z_image_inpaint.py:176` ZImageInpaintPipeline — adds the
nearest-resized latent mask and per-step blend
`latents = (1-mask)·scale_noise(image_latents, t_next) + mask·latents`
(`:891-901`)).

TPU-first: the mask blend runs inside the single scanned jitted loop with
`(t, t_next, g, is_last)` scan inputs; CFG stays the doubled-batch per-step
scalar-guidance form of the base pipeline.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.jax_utils import randn_tensor
from ..inpaint_utils import as_mask_array as _as_mask_array, check_strength_and_schedule
from .pipeline_z_image import ZImagePipeline, ZImagePipelineOutput


class ZImageImg2ImgPipeline(ZImagePipeline):
    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        image=None,
        strength: float = 0.6,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        sigmas: Optional[List[float]] = None,
        guidance_scale: float = 5.0,
        cfg_normalization: bool = False,
        cfg_truncation: float = 1.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        if key is None:
            key = jax.random.PRNGKey(0)
        if not 0 <= strength <= 1:
            raise ValueError(f"strength must be in [0, 1], got {strength}")

        do_cfg = guidance_scale > 1.0
        cap, cap_attn, cap_inner, all_lens, batch_size = self._prep_text(
            prompt, negative_prompt, do_cfg, max_sequence_length)

        image_latents = self._encode_image_latents(image, height, width, batch_size)
        lh, lw = image_latents.shape[-2], image_latents.shape[-1]
        height = height or lh * self.vae_scale_factor
        width = width or lw * self.vae_scale_factor

        state = self._schedule(num_inference_steps, sigmas, (lh // 2) * (lw // 2))

        init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
        t_start = max(num_inference_steps - init_timestep, 0)
        timesteps = state.timesteps[t_start:]
        check_strength_and_schedule(strength, timesteps)

        key, noise_key = jax.random.split(key)
        noise = randn_tensor(image_latents.shape, key=noise_key)
        latents = self.scheduler.scale_noise(state, image_latents, timesteps[:1], noise)

        g_steps = self._guidance_steps(timesteps, guidance_scale, cfg_truncation)
        x_freqs, cap_freqs = transformer.compute_freqs(
            tuple(int(n) for n in all_lens), (1, lh // 2, lw // 2), cap.shape[1])

        denoise = self._jit(
            "denoise",
            partial(self._denoise, do_cfg=do_cfg, cfg_normalization=bool(cfg_normalization)),
            static=(do_cfg, bool(cfg_normalization)),
        )
        latents = denoise(t_params, latents, jnp.asarray(cap), jnp.asarray(cap_attn),
                          jnp.asarray(cap_inner), x_freqs, cap_freqs, g_steps,
                          timesteps, state)

        image = latents if output_type == "latent" else self._decode(latents, output_type)
        if not return_dict:
            return (image,)
        return ZImagePipelineOutput(images=image)


class ZImageInpaintPipeline(ZImagePipeline):
    def _denoise_inpaint(self, t_params, latents, image_latents, noise, mask, cap,
                         cap_attn, cap_inner, x_freqs, cap_freqs, g_steps, timesteps,
                         state, do_cfg, cfg_normalization):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        n = timesteps.shape[0]
        t_next = jnp.concatenate([timesteps[1:], timesteps[-1:]])
        is_last = (jnp.arange(n) == n - 1)

        def forward(latents, t, g):
            t_norm = (1000.0 - t) / 1000.0
            latent_in = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            tt = jnp.broadcast_to(t_norm, (latent_in.shape[0],))
            pred = transformer(
                t_params, latent_in[:, :, None], tt, cap,
                cap_attn_mask=cap_attn, cap_inner_pad_mask=cap_inner,
                x_freqs=x_freqs, cap_freqs=cap_freqs,
            ).sample[:, :, 0]
            if do_cfg:
                pos, neg = jnp.split(pred.astype(jnp.float32), 2, axis=0)
                out = pos + g * (pos - neg)
                if cfg_normalization:
                    pos_norm = jnp.sqrt(jnp.sum(pos**2, axis=(1, 2, 3), keepdims=True))
                    new_norm = jnp.sqrt(jnp.sum(out**2, axis=(1, 2, 3), keepdims=True))
                    out = jnp.where(new_norm > pos_norm, out * (pos_norm / new_norm), out)
                pred = out
            return -pred.astype(latents.dtype)

        def step_fn(carry, xs):
            t, tn, g, last = xs
            latents, sstate = carry
            out = scheduler.step(sstate, forward(latents, t, g), t, latents)
            proper = jnp.where(
                last, image_latents, scheduler.scale_noise(sstate, image_latents, tn, noise)
            )
            blended = (1.0 - mask) * proper + mask * out.prev_sample
            return (blended, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state),
                                       (timesteps, t_next, g_steps, is_last))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        image=None,
        mask_image=None,
        strength: float = 1.0,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        sigmas: Optional[List[float]] = None,
        guidance_scale: float = 5.0,
        cfg_normalization: bool = False,
        cfg_truncation: float = 1.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        if key is None:
            key = jax.random.PRNGKey(0)
        if not 0 <= strength <= 1:
            raise ValueError(f"strength must be in [0, 1], got {strength}")

        do_cfg = guidance_scale > 1.0
        cap, cap_attn, cap_inner, all_lens, batch_size = self._prep_text(
            prompt, negative_prompt, do_cfg, max_sequence_length)

        image_latents = self._encode_image_latents(image, height, width, batch_size)
        lh, lw = image_latents.shape[-2], image_latents.shape[-1]
        height = height or lh * self.vae_scale_factor
        width = width or lw * self.vae_scale_factor

        # pixel mask → latent-res nearest (reference `:349`)
        mask = _as_mask_array(mask_image)  # [H, W] or [B,1,H,W]
        if mask.ndim == 2:
            mask = mask[None, None]
        mask = jax.image.resize(jnp.asarray(mask, jnp.float32),
                                (mask.shape[0], 1, lh, lw), method="nearest")
        if mask.shape[0] < batch_size:
            mask = jnp.repeat(mask, batch_size // mask.shape[0], axis=0)

        state = self._schedule(num_inference_steps, sigmas, (lh // 2) * (lw // 2))

        init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
        t_start = max(num_inference_steps - init_timestep, 0)
        timesteps = state.timesteps[t_start:]
        check_strength_and_schedule(strength, timesteps)

        key, noise_key = jax.random.split(key)
        noise = randn_tensor(image_latents.shape, key=noise_key)
        latents = self.scheduler.scale_noise(state, image_latents, timesteps[:1], noise)

        g_steps = self._guidance_steps(timesteps, guidance_scale, cfg_truncation)
        x_freqs, cap_freqs = transformer.compute_freqs(
            tuple(int(n) for n in all_lens), (1, lh // 2, lw // 2), cap.shape[1])

        denoise = self._jit(
            "denoise_inpaint",
            partial(self._denoise_inpaint, do_cfg=do_cfg, cfg_normalization=bool(cfg_normalization)),
            static=(do_cfg, bool(cfg_normalization)),
        )
        latents = denoise(t_params, latents, image_latents, noise, mask, jnp.asarray(cap),
                          jnp.asarray(cap_attn), jnp.asarray(cap_inner), x_freqs, cap_freqs,
                          g_steps, timesteps, state)

        image = latents if output_type == "latent" else self._decode(latents, output_type)
        if not return_dict:
            return (image,)
        return ZImagePipelineOutput(images=image)
