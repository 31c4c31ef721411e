"""Flux + ControlNet text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/flux/pipeline_flux_controlnet.py:185`
FluxControlNetPipeline; control-image prep `:918-951`, hot loop `:1055-1130`).

TPU-first: control image is VAE-encoded + packed once host-side; the
ControlNet runs inside the single scanned/jitted denoise loop feeding
residuals into the transformer — zero host sync per step. RoPE tables for
both nets are precomputed host-side in float64 (union mode prepends one
mode-token row for the ControlNet's table only).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils.jax_utils import randn_tensor
from .pipeline_flux import FluxPipeline, FluxPipelineOutput


class FluxControlNetPipeline(FluxPipeline):
    def __init__(self, scheduler, vae, text_encoder, tokenizer, text_encoder_2, tokenizer_2,
                 transformer, controlnet, image_encoder=None, feature_extractor=None):
        super().__init__(
            scheduler=scheduler, vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
            text_encoder_2=text_encoder_2, tokenizer_2=tokenizer_2, transformer=transformer,
            image_encoder=image_encoder, feature_extractor=feature_extractor,
        )
        self.register_modules(controlnet=controlnet)

    def _denoise_cn(self, transformer_params, cn_params, latents, prompt_embeds,
                    pooled_prompt_embeds, rope_cos, rope_sin, cn_rope_cos, cn_rope_sin,
                    timesteps, state, guidance, control_image, control_mode,
                    conditioning_scale, blocks_repeat):
        transformer = self.transformer[0]
        controlnet = self.controlnet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            timestep = jnp.broadcast_to(t, (latents.shape[0],)) / 1000.0
            cn_out = controlnet(
                cn_params,
                latents,
                control_image,
                controlnet_mode=control_mode,
                conditioning_scale=conditioning_scale,
                encoder_hidden_states=prompt_embeds,
                pooled_projections=pooled_prompt_embeds,
                timestep=timestep,
                guidance=guidance,
                image_rotary_emb=(cn_rope_cos, cn_rope_sin),
            )
            noise_pred = transformer(
                transformer_params,
                latents,
                encoder_hidden_states=prompt_embeds,
                pooled_projections=pooled_prompt_embeds,
                timestep=timestep,
                guidance=guidance,
                image_rotary_emb=(rope_cos, rope_sin),
                controlnet_block_samples=cn_out.controlnet_block_samples,
                controlnet_single_block_samples=cn_out.controlnet_single_block_samples,
                controlnet_blocks_repeat=blocks_repeat,
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
        control_mode: Optional[int] = None,
        controlnet_conditioning_scale: float = 1.0,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 28,
        guidance_scale: float = 3.5,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        pooled_prompt_embeds: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, transformer_params = self.transformer
        controlnet, cn_params = self.controlnet
        vae, vae_params = self.vae
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)
        key, enc_key = jax.random.split(key)

        if prompt_embeds is None or pooled_prompt_embeds is None:
            prompt_embeds, pooled_prompt_embeds, txt_ids = self.encode_prompt(prompt, prompt_2, max_sequence_length)
        else:
            txt_ids = np.zeros((prompt_embeds.shape[1], 3), dtype=np.float32)
        batch_size = prompt_embeds.shape[0]

        # control image: NCHW [-1,1] float array (or processed via image_processor)
        if not isinstance(control_image, (jax.Array, jnp.ndarray)):
            control_image = jnp.asarray(self.image_processor.preprocess(control_image, height=height, width=width))
        if control_image.shape[0] < batch_size:
            control_image = jnp.tile(control_image, (batch_size // control_image.shape[0], 1, 1, 1))

        blocks_repeat = controlnet.input_hint_block is not None
        if controlnet.input_hint_block is None:
            # InstantX-style: VAE-encode + pack the control image
            # (reference pipeline_flux_controlnet.py:931-945)
            ci = vae.encode(vae_params, control_image).sample(enc_key)
            shift = vae.config.get("shift_factor") or 0.0
            ci = (ci - shift) * vae.config.scaling_factor
            control_cond = self._pack_latents(ci)
        else:
            # Xlabs-style: raw pixels NHWC into the hint conv stack
            control_cond = jnp.transpose(control_image, (0, 2, 3, 1))

        mode_arr = None
        if controlnet.union:
            if control_mode is None:
                raise ValueError("`control_mode` is required for a ControlNet-Union model")
            mode_arr = jnp.full((batch_size, 1), int(control_mode), dtype=jnp.int32)

        # latents (packed 2x2 patches)
        num_channels_latents = transformer.config.in_channels // 4
        lh = 2 * (height // (self.vae_scale_factor * 2))
        lw = 2 * (width // (self.vae_scale_factor * 2))
        if latents is None:
            latents = randn_tensor((batch_size, num_channels_latents, lh, lw), key=key)
            latents = self._pack_latents(latents)
        img_ids = self._prepare_latent_image_ids(lh // 2, lw // 2)

        ids = np.concatenate([txt_ids, img_ids], axis=0)
        rope_cos, rope_sin = transformer.pos_embed({}, ids)
        if controlnet.union:
            cn_ids = np.concatenate([txt_ids[:1], txt_ids, img_ids], axis=0)
            cn_rope_cos, cn_rope_sin = controlnet.pos_embed({}, cn_ids)
        else:
            cn_rope_cos, cn_rope_sin = rope_cos, rope_sin

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

        denoise = self._jit(
            "denoise_cn",
            partial(self._denoise_cn, conditioning_scale=controlnet_conditioning_scale,
                    blocks_repeat=blocks_repeat),
            static=(controlnet_conditioning_scale, blocks_repeat),
        )
        latents = denoise(
            transformer_params, cn_params, latents, prompt_embeds, pooled_prompt_embeds,
            jnp.asarray(rope_cos), jnp.asarray(rope_sin),
            jnp.asarray(cn_rope_cos), jnp.asarray(cn_rope_sin),
            state.timesteps, state, guidance, control_cond, mode_arr,
        )

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
