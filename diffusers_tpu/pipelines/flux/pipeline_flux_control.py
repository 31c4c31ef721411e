"""Flux Control pipelines (channel-concat structural conditioning).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/flux/pipeline_flux_control.py:159`
FluxControlPipeline, `pipeline_flux_control_img2img.py:174`,
`pipeline_flux_control_inpaint.py:194`): Flux-Control checkpoints (Canny /
Depth) double the transformer's input channels; the VAE-encoded + packed
control latents are concatenated to the noisy latents along the packed
feature axis every step (`pipeline_flux_control.py:805`). Img2img adds the
strength-truncated `scale_noise` init; inpaint adds the per-step packed-mask
blend of `pipeline_flux_inpaint.py:1180`.

TPU-first: the control concat happens inside the single scanned/jitted
denoise loop (XLA fuses the concat into the input projection); control
latents are encoded + packed once host-side.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ..inpaint_utils import (
    as_mask_array as _as_mask_array,
    check_strength_and_schedule,
    prepare_packed_mask,
    repeat_to_batch,
)
from .pipeline_flux import FluxPipeline, FluxPipelineOutput

logger = logging.get_logger(__name__)


class FluxControlPipeline(FluxPipeline):
    """Text-to-image with packed-latent channel-concat control."""

    def _encode_pack_control(self, control_image, height, width, batch_size, enc_key):
        vae, vae_params = self.vae
        if not isinstance(control_image, (jax.Array, jnp.ndarray)):
            control_image = jnp.asarray(
                self.image_processor.preprocess(control_image, height=height, width=width))
        else:
            control_image = jnp.asarray(control_image)
        if control_image.ndim == 4 and control_image.shape[1] == 3:
            ci = vae.encode(vae_params, control_image).sample(enc_key)
            shift = vae.config.get("shift_factor") or 0.0
            ci = (ci - shift) * vae.config.scaling_factor
        else:
            ci = control_image  # already latent-space
        ci = repeat_to_batch(ci, batch_size, what="control image")
        return self._pack_latents(ci)

    def _denoise_control(self, transformer_params, latents, control_latents, prompt_embeds,
                         pooled_prompt_embeds, rope_cos, rope_sin, timesteps, state, guidance):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            timestep = jnp.broadcast_to(t, (latents.shape[0],)) / 1000.0
            noise_pred = transformer(
                transformer_params,
                jnp.concatenate([latents, control_latents], axis=2),
                encoder_hidden_states=prompt_embeds,
                pooled_projections=pooled_prompt_embeds,
                timestep=timestep,
                guidance=guidance,
                image_rotary_emb=(rope_cos, rope_sin),
            ).sample
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        prompt_2: Optional[Union[str, List[str]]] = None,
        control_image=None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 28,
        guidance_scale: float = 3.5,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        pooled_prompt_embeds: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, transformer_params = self.transformer
        vae, vae_params = self.vae
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)
        key, enc_key, lat_key = jax.random.split(key, 3)

        if prompt_embeds is None or pooled_prompt_embeds is None:
            prompt_embeds, pooled_prompt_embeds, txt_ids = self.encode_prompt(
                prompt, prompt_2, max_sequence_length)
        else:
            txt_ids = np.zeros((prompt_embeds.shape[1], 3), dtype=np.float32)
        batch_size = prompt_embeds.shape[0] * num_images_per_prompt
        if num_images_per_prompt != 1:
            prompt_embeds = jnp.repeat(prompt_embeds, num_images_per_prompt, axis=0)
            pooled_prompt_embeds = jnp.repeat(pooled_prompt_embeds, num_images_per_prompt, axis=0)

        control_latents = self._encode_pack_control(control_image, height, width, batch_size, enc_key)

        # control checkpoints double in_channels (reference `:732`)
        num_channels_latents = transformer.config.in_channels // 8
        lh = 2 * (height // (self.vae_scale_factor * 2))
        lw = 2 * (width // (self.vae_scale_factor * 2))
        if latents is None:
            latents = randn_tensor((batch_size, num_channels_latents, lh, lw), key=lat_key)
            latents = self._pack_latents(latents)
        img_ids = self._prepare_latent_image_ids(lh // 2, lw // 2)

        ids = np.concatenate([txt_ids, img_ids], axis=0)
        rope_cos, rope_sin = transformer.pos_embed({}, ids)

        image_seq_len = latents.shape[1]
        sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        mu = calculate_shift(
            image_seq_len,
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        if self.scheduler.config.use_dynamic_shifting:
            state = self.scheduler.set_timesteps(sigmas=list(sigmas), mu=mu)
        else:
            state = self.scheduler.set_timesteps(num_inference_steps)

        guidance = None
        if transformer.config.guidance_embeds:
            guidance = jnp.full((batch_size,), guidance_scale, dtype=jnp.float32)

        denoise = self._jit("denoise_control", self._denoise_control)
        latents = denoise(
            transformer_params, latents, control_latents, prompt_embeds, pooled_prompt_embeds,
            jnp.asarray(rope_cos), jnp.asarray(rope_sin), state.timesteps, state, guidance,
        )

        return self._finalize(latents, height, width, output_type, return_dict)

    def _finalize(self, latents, height, width, output_type, return_dict):
        vae, vae_params = self.vae
        if output_type == "latent":
            image = latents
        else:
            latents = self._unpack_latents(latents, height, width, self.vae_scale_factor)

            def decode(p, z):
                z = z / vae.config.scaling_factor
                if vae.config.get("shift_factor") is not None:
                    z = z + vae.config.shift_factor
                return vae.decode(p, z).sample

            image = self._jit("decode", decode)(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)
        if not return_dict:
            return (image,)
        return FluxPipelineOutput(images=image)
