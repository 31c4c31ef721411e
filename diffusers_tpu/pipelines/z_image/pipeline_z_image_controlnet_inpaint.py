"""Z-Image ControlNet inpainting pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/z_image/pipeline_z_image_controlnet_inpaint.py:190`
ZImageControlNetInpaintPipeline): ControlNet residual injection per step
(`pipeline_z_image_controlnet.py:662-675`) combined with the
strength-truncated `scale_noise` init and per-step nearest-latent-mask blend
of `pipeline_z_image_inpaint.py:891-901`.

TPU-first: ControlNet, base transformer, scheduler step, and mask blend all
run inside one scanned jitted loop with `(t, t_next, g, is_last)` scan inputs.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...utils.jax_utils import randn_tensor
from ..inpaint_utils import as_mask_array as _as_mask_array, check_strength_and_schedule
from .pipeline_z_image import ZImagePipelineOutput
from .pipeline_z_image_controlnet import ZImageControlNetPipeline


class ZImageControlNetInpaintPipeline(ZImageControlNetPipeline):
    def _denoise_cn_inpaint(self, t_params, cn_params, latents, control_ctx, image_latents,
                            noise, mask, cap, cap_attn, cap_inner, x_freqs, cap_freqs,
                            g_steps, timesteps, state, do_cfg, cfg_normalization,
                            conditioning_scale):
        transformer = self.transformer[0]
        controlnet = self.controlnet[0]
        scheduler = self.scheduler
        n = timesteps.shape[0]
        t_next = jnp.concatenate([timesteps[1:], timesteps[-1:]])
        is_last = (jnp.arange(n) == n - 1)

        def forward(latents, t, g):
            t_norm = (1000.0 - t) / 1000.0
            latent_in = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            ctrl_in = jnp.concatenate([control_ctx, control_ctx], axis=0) if do_cfg else control_ctx
            tt = jnp.broadcast_to(t_norm, (latent_in.shape[0],))
            samples = controlnet(
                cn_params, t_params, latent_in[:, :, None], tt, cap, ctrl_in,
                cap_attn_mask=cap_attn, cap_inner_pad_mask=cap_inner,
                x_freqs=x_freqs, cap_freqs=cap_freqs,
                conditioning_scale=conditioning_scale,
            ).controlnet_block_samples
            pred = transformer(
                t_params, latent_in[:, :, None], tt, cap,
                cap_attn_mask=cap_attn, cap_inner_pad_mask=cap_inner,
                x_freqs=x_freqs, cap_freqs=cap_freqs,
                controlnet_block_samples=samples,
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
        control_image=None,
        strength: float = 1.0,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        sigmas: Optional[List[float]] = None,
        guidance_scale: float = 5.0,
        controlnet_conditioning_scale: float = 0.75,
        cfg_normalization: bool = False,
        cfg_truncation: float = 1.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        _, cn_params = self.controlnet
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

        control_ctx = self._prepare_control_latents(control_image, height, width, batch_size)

        mask = _as_mask_array(mask_image)
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
            "denoise_cn_inpaint",
            partial(self._denoise_cn_inpaint, do_cfg=do_cfg,
                    cfg_normalization=bool(cfg_normalization),
                    conditioning_scale=float(controlnet_conditioning_scale)),
            static=(do_cfg, bool(cfg_normalization), float(controlnet_conditioning_scale)),
        )
        latents = denoise(t_params, cn_params, latents, control_ctx, image_latents, noise,
                          mask, jnp.asarray(cap), jnp.asarray(cap_attn), jnp.asarray(cap_inner),
                          x_freqs, cap_freqs, g_steps, timesteps, state)

        image = latents if output_type == "latent" else self._decode(latents, output_type)
        if not return_dict:
            return (image,)
        return ZImagePipelineOutput(images=image)
