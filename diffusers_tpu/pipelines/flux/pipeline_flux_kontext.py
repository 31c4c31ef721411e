"""Flux Kontext (instruction-based image editing) pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/flux/pipeline_flux_kontext.py`:
prepare_latents `:635-671` — reference image VAE-encoded (argmax/mode),
packed and appended along the SEQUENCE axis with RoPE ids whose first
coordinate is 1; hot loop `:1035-1050` concatenates per step and slices the
prediction back to the noise tokens). Single-scan TPU denoise with the
conditioning tokens as scan constants.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils.jax_utils import randn_tensor
from .pipeline_flux import FluxPipeline, FluxPipelineOutput


class FluxKontextPipeline(FluxPipeline):
    def _denoise_kontext(self, transformer_params, latents, image_latents, prompt_embeds,
                         pooled_prompt_embeds, rope_cos, rope_sin, timesteps, state, guidance):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        image_seq = latents.shape[1]

        def step_fn(carry, t):
            latents, sstate = carry
            timestep = jnp.broadcast_to(t, (latents.shape[0],)) / 1000.0
            noise_pred = transformer(
                transformer_params,
                jnp.concatenate([latents, image_latents], axis=1),
                encoder_hidden_states=prompt_embeds,
                pooled_projections=pooled_prompt_embeds,
                timestep=timestep,
                guidance=guidance,
                image_rotary_emb=(rope_cos, rope_sin),
            ).sample[:, :image_seq]
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        prompt_2: Optional[Union[str, List[str]]] = None,
        image=None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 28,
        guidance_scale: float = 2.5,
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
        if key is None:
            key = jax.random.PRNGKey(0)
        key, lat_key = jax.random.split(key)

        init = jnp.asarray(self.image_processor.preprocess(image))
        height = height or init.shape[-2]
        width = width or init.shape[-1]

        if prompt_embeds is None or pooled_prompt_embeds is None:
            prompt_embeds, pooled_prompt_embeds, txt_ids = self.encode_prompt(prompt, prompt_2, max_sequence_length)
        else:
            txt_ids = np.zeros((prompt_embeds.shape[1], 3), dtype=np.float32)
        batch_size = prompt_embeds.shape[0] * num_images_per_prompt
        if num_images_per_prompt != 1:
            prompt_embeds = jnp.repeat(prompt_embeds, num_images_per_prompt, axis=0)
            pooled_prompt_embeds = jnp.repeat(pooled_prompt_embeds, num_images_per_prompt, axis=0)

        # reference image → latent tokens (mode/argmax of the posterior,
        # kontext `:605` sample_mode="argmax")
        image_latents = vae.encode(vae_params, init).mode()
        if vae.config.get("shift_factor") is not None:
            image_latents = image_latents - vae.config.shift_factor
        image_latents = image_latents * vae.config.scaling_factor
        if image_latents.shape[0] < batch_size:
            image_latents = jnp.repeat(image_latents, batch_size // image_latents.shape[0], axis=0)
        ih, iw = image_latents.shape[2], image_latents.shape[3]
        packed_image = self._pack_latents(image_latents)
        image_ids = self._prepare_latent_image_ids(ih // 2, iw // 2)
        image_ids[..., 0] = 1  # conditioning stream marker (kontext `:661`)

        num_channels_latents = transformer.config.in_channels // 4
        lh = 2 * (height // (self.vae_scale_factor * 2))
        lw = 2 * (width // (self.vae_scale_factor * 2))
        if latents is None:
            latents = randn_tensor((batch_size, num_channels_latents, lh, lw), key=lat_key)
            latents = self._pack_latents(latents)
        latent_ids = self._prepare_latent_image_ids(lh // 2, lw // 2)

        ids = np.concatenate([txt_ids, latent_ids, image_ids], axis=0)
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

        denoise = self._jit("denoise", self._denoise_kontext)
        latents = denoise(
            transformer_params, latents, packed_image, prompt_embeds, pooled_prompt_embeds,
            jnp.asarray(rope_cos), jnp.asarray(rope_sin), state.timesteps, state, guidance,
        )

        if output_type == "latent":
            out_image = latents
        else:
            latents = self._unpack_latents(latents, height, width, self.vae_scale_factor)

            def decode(p, z):
                z = z / vae.config.scaling_factor
                if vae.config.get("shift_factor") is not None:
                    z = z + vae.config.shift_factor
                return vae.decode(p, z).sample

            out_image = self._jit("decode", decode)(vae_params, latents)
            out_image = self.image_processor.postprocess(out_image, output_type=output_type)

        if not return_dict:
            return (out_image,)
        return FluxPipelineOutput(images=out_image)
