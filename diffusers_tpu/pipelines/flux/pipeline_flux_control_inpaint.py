"""Flux Control inpainting (channel-concat structural conditioning).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/flux/pipeline_flux_control_inpaint.py:194`):
strength init + per-step packed-mask blend (`pipeline_flux_inpaint.py:1180`),
with the transformer input concatenated with control latents every step. See
`pipeline_flux_control.py` for the shared TPU-first design notes.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils.jax_utils import randn_tensor
from ..inpaint_utils import (
    as_mask_array as _as_mask_array,
    check_strength_and_schedule,
    prepare_packed_mask,
    repeat_to_batch,
)
from .pipeline_flux_control import FluxControlPipeline


class FluxControlInpaintPipeline(FluxControlPipeline):
    """Inpainting with channel-concat control (reference
    `pipeline_flux_control_inpaint.py:194`): strength init + per-step
    packed-mask blend, transformer input concatenated with control latents."""

    def _denoise_control_inpaint(self, transformer_params, latents, control_latents,
                                 image_latents, noise, mask, prompt_embeds,
                                 pooled_prompt_embeds, rope_cos, rope_sin,
                                 timesteps, state, guidance):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        n = timesteps.shape[0]
        t_next = jnp.concatenate([timesteps[1:], timesteps[-1:]])
        is_last = (jnp.arange(n) == n - 1)

        def step_fn(carry, xs):
            t, tn, last = xs
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
            proper = jnp.where(
                last, image_latents, scheduler.scale_noise(sstate, image_latents, tn, noise)
            )
            blended = (1.0 - mask) * proper + mask * out.prev_sample
            return (blended, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (timesteps, t_next, is_last))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        prompt_2: Optional[Union[str, List[str]]] = None,
        image=None,
        control_image=None,
        mask_image=None,
        strength: float = 0.6,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 28,
        guidance_scale: float = 3.5,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        pooled_prompt_embeds: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, transformer_params = self.transformer
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        init = jnp.asarray(self.image_processor.preprocess(image, height, width))
        height = height or init.shape[-2]
        width = width or init.shape[-1]
        mask = _as_mask_array(mask_image)

        if prompt_embeds is None or pooled_prompt_embeds is None:
            prompt_embeds, pooled_prompt_embeds, txt_ids = self.encode_prompt(
                prompt, prompt_2, max_sequence_length)
        else:
            txt_ids = np.zeros((prompt_embeds.shape[1], 3), dtype=np.float32)
        batch_size = prompt_embeds.shape[0] * num_images_per_prompt
        if num_images_per_prompt != 1:
            prompt_embeds = jnp.repeat(prompt_embeds, num_images_per_prompt, axis=0)
            pooled_prompt_embeds = jnp.repeat(pooled_prompt_embeds, num_images_per_prompt, axis=0)

        key, enc_key, ctrl_key, noise_key = jax.random.split(key, 4)
        image_latents = vae.encode(vae_params, init).sample(enc_key)
        if vae.config.get("shift_factor") is not None:
            image_latents = image_latents - vae.config.shift_factor
        image_latents = image_latents * vae.config.scaling_factor
        image_latents = repeat_to_batch(image_latents, batch_size, what="image")

        num_channels_latents = image_latents.shape[1]
        lh, lw = image_latents.shape[2], image_latents.shape[3]
        packed_image = self._pack_latents(image_latents)
        packed_mask = prepare_packed_mask(mask, batch_size, num_channels_latents, lh, lw,
                                          self._pack_latents)
        control_latents = self._encode_pack_control(control_image, height, width, batch_size, ctrl_key)
        img_ids = self._prepare_latent_image_ids(lh // 2, lw // 2)

        ids = np.concatenate([txt_ids, img_ids], axis=0)
        rope_cos, rope_sin = transformer.pos_embed({}, ids)

        sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        mu = calculate_shift(
            packed_image.shape[1],
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        if self.scheduler.config.use_dynamic_shifting:
            state = self.scheduler.set_timesteps(sigmas=list(sigmas), mu=mu)
        else:
            state = self.scheduler.set_timesteps(num_inference_steps)

        init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
        t_start = max(num_inference_steps - init_timestep, 0)
        timesteps = state.timesteps[t_start:]
        check_strength_and_schedule(strength, timesteps)

        noise = randn_tensor(packed_image.shape, key=noise_key)
        latents = self.scheduler.scale_noise(state, packed_image, timesteps[:1], noise)

        guidance = None
        if transformer.config.guidance_embeds:
            guidance = jnp.full((batch_size,), guidance_scale, dtype=jnp.float32)

        denoise = self._jit("denoise_control_inpaint", self._denoise_control_inpaint)
        latents = denoise(
            transformer_params, latents, control_latents, packed_image, noise, packed_mask,
            prompt_embeds, pooled_prompt_embeds,
            jnp.asarray(rope_cos), jnp.asarray(rope_sin), timesteps, state, guidance,
        )

        return self._finalize(latents, height, width, output_type, return_dict)
