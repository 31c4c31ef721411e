"""Flux Control image-to-image (channel-concat structural conditioning).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/flux/pipeline_flux_control_img2img.py:174`):
the strength-truncated `scale_noise` init of img2img combined with the
Flux-Control packed-latent channel concat. See `pipeline_flux_control.py` for
the shared TPU-first design notes (single scanned/jitted denoise, control
latents encoded + packed once host-side).
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils.jax_utils import randn_tensor
from ..inpaint_utils import check_strength_and_schedule, repeat_to_batch
from .pipeline_flux_control import FluxControlPipeline


class FluxControlImg2ImgPipeline(FluxControlPipeline):
    """Image-to-image with channel-concat control (reference
    `pipeline_flux_control_img2img.py:174`)."""

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        prompt_2: Optional[Union[str, List[str]]] = None,
        image=None,
        control_image=None,
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
        init_latents = vae.encode(vae_params, init).sample(enc_key)
        if vae.config.get("shift_factor") is not None:
            init_latents = init_latents - vae.config.shift_factor
        init_latents = init_latents * vae.config.scaling_factor
        init_latents = repeat_to_batch(init_latents, batch_size, what="image")

        lh, lw = init_latents.shape[2], init_latents.shape[3]
        packed_init = self._pack_latents(init_latents)
        control_latents = self._encode_pack_control(control_image, height, width, batch_size, ctrl_key)
        img_ids = self._prepare_latent_image_ids(lh // 2, lw // 2)

        ids = np.concatenate([txt_ids, img_ids], axis=0)
        rope_cos, rope_sin = transformer.pos_embed({}, ids)

        sigmas = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps)
        mu = calculate_shift(
            packed_init.shape[1],
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

        noise = randn_tensor(packed_init.shape, key=noise_key)
        latents = self.scheduler.scale_noise(state, packed_init, timesteps[:1], noise)

        guidance = None
        if transformer.config.guidance_embeds:
            guidance = jnp.full((batch_size,), guidance_scale, dtype=jnp.float32)

        denoise = self._jit("denoise_control", self._denoise_control)
        latents = denoise(
            transformer_params, latents, control_latents, prompt_embeds, pooled_prompt_embeds,
            jnp.asarray(rope_cos), jnp.asarray(rope_sin), timesteps, state, guidance,
        )

        return self._finalize(latents, height, width, output_type, return_dict)
