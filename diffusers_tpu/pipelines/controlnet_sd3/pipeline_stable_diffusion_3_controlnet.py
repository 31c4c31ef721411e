"""SD3 + ControlNet text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/controlnet_sd3/pipeline_stable_diffusion_3_controlnet.py:148`;
control-image VAE prep `:1058-1096`, pooled-projection zeroing `:1137-1141`,
hot loop `:1150-1210`).

TPU-first: control image is VAE-encoded once host-side; ControlNet +
MMDiT run inside one scanned/jitted CFG denoise loop.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...utils.jax_utils import randn_tensor
from ..stable_diffusion_3.pipeline_stable_diffusion_3 import (
    StableDiffusion3Pipeline,
    StableDiffusion3PipelineOutput,
)


class StableDiffusion3ControlNetPipeline(StableDiffusion3Pipeline):
    def __init__(self, transformer, scheduler, vae, text_encoder, tokenizer, text_encoder_2,
                 tokenizer_2, text_encoder_3=None, tokenizer_3=None, controlnet=None):
        super().__init__(
            transformer=transformer, scheduler=scheduler, vae=vae, text_encoder=text_encoder,
            tokenizer=tokenizer, text_encoder_2=text_encoder_2, tokenizer_2=tokenizer_2,
            text_encoder_3=text_encoder_3, tokenizer_3=tokenizer_3,
        )
        self.register_modules(controlnet=controlnet)

    def _denoise_cn(self, t_params, cn_params, latents, prompt_embeds, pooled, cn_pooled,
                    control_cond, timesteps, state, guidance_scale, do_cfg, conditioning_scale):
        transformer = self.transformer[0]
        controlnet = self.controlnet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            timestep = jnp.broadcast_to(t, (latent_input.shape[0],))
            cn_out = controlnet(
                cn_params, latent_input, control_cond,
                conditioning_scale=conditioning_scale,
                encoder_hidden_states=prompt_embeds,
                pooled_projections=cn_pooled,
                timestep=timestep,
            )
            noise_pred = transformer(
                t_params, latent_input, prompt_embeds, pooled, timestep,
                block_controlnet_hidden_states=cn_out.controlnet_block_samples,
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        control_image=None,
        controlnet_conditioning_scale: float = 1.0,
        controlnet_pooled_projections: Optional[jax.Array] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 28,
        guidance_scale: float = 7.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 256,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        controlnet, cn_params = self.controlnet
        vae, vae_params = self.vae
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)
        key, enc_key = jax.random.split(key)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, neg_embeds, pooled, neg_pooled = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length
        )
        batch_size = prompt_embeds.shape[0]
        if do_cfg:
            prompt_embeds = jnp.concatenate([neg_embeds, prompt_embeds], axis=0)
            pooled = jnp.concatenate([neg_pooled, pooled], axis=0)

        # control image -> VAE latents; InstantX nets were trained with zero
        # pooled projections and an un-shifted VAE (reference :1058-1062)
        force_zeros = controlnet.config.get("force_zeros_for_pooled_projection", True)
        vae_shift = 0.0 if force_zeros else (vae.config.get("shift_factor") or 0.0)
        if not isinstance(control_image, (jax.Array, jnp.ndarray)):
            control_image = jnp.asarray(self.image_processor.preprocess(control_image, height=height, width=width))
        ci = vae.encode(vae_params, control_image).sample(enc_key)
        ci = (ci - vae_shift) * vae.config.scaling_factor
        reps = (batch_size * (2 if do_cfg else 1)) // ci.shape[0]
        if reps > 1:
            ci = jnp.tile(ci, (reps, 1, 1, 1))

        cn_pooled = jnp.zeros_like(pooled) if force_zeros else (
            controlnet_pooled_projections if controlnet_pooled_projections is not None else pooled
        )

        shape = (batch_size, transformer.config.in_channels,
                 height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            latents = randn_tensor(shape, key=key)

        state = self.scheduler.set_timesteps(num_inference_steps)

        denoise = self._jit(
            "denoise_cn",
            partial(self._denoise_cn, guidance_scale=guidance_scale, do_cfg=do_cfg,
                    conditioning_scale=controlnet_conditioning_scale),
            static=(guidance_scale, do_cfg, controlnet_conditioning_scale),
        )
        latents = denoise(t_params, cn_params, latents, prompt_embeds, pooled, cn_pooled,
                          ci, state.timesteps, state)

        if output_type == "latent":
            image = latents
        else:
            def decode(p, z):
                z = z / vae.config.scaling_factor
                if vae.config.get("shift_factor") is not None:
                    z = z + vae.config.shift_factor
                return vae.decode(p, z).sample

            image = self._jit("decode", decode)(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return StableDiffusion3PipelineOutput(images=image)
