"""Flux + ControlNet inpainting pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/flux/pipeline_flux_controlnet_inpainting.py:183`
FluxControlNetInpaintPipeline): ControlNet residual injection per step
combined with the strength-truncated init and per-step packed-mask blend of
`pipeline_flux_inpaint.py:1180`.

TPU-first: ControlNet, transformer, scheduler step, and mask blend all live
inside one scanned/jitted loop with `(t, t_next, is_last)` scan inputs.
"""

from __future__ import annotations

from functools import partial
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
from .pipeline_flux import FluxPipelineOutput
from .pipeline_flux_controlnet import FluxControlNetPipeline


class FluxControlNetInpaintPipeline(FluxControlNetPipeline):
    def _denoise_cn_inpaint(self, transformer_params, cn_params, latents, image_latents,
                            noise, mask, prompt_embeds, pooled_prompt_embeds,
                            rope_cos, rope_sin, cn_rope_cos, cn_rope_sin,
                            timesteps, state, guidance, control_image, control_mode,
                            conditioning_scale, blocks_repeat):
        transformer = self.transformer[0]
        controlnet = self.controlnet[0]
        scheduler = self.scheduler
        n = timesteps.shape[0]
        t_next = jnp.concatenate([timesteps[1:], timesteps[-1:]])
        is_last = (jnp.arange(n) == n - 1)

        def step_fn(carry, xs):
            t, tn, last = xs
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
        mask_image=None,
        control_image=None,
        control_mode: Optional[int] = None,
        controlnet_conditioning_scale: float = 1.0,
        strength: float = 0.6,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 28,
        guidance_scale: float = 7.0,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        pooled_prompt_embeds: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, transformer_params = self.transformer
        controlnet, cn_params = self.controlnet
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

        if not isinstance(control_image, (jax.Array, jnp.ndarray)):
            control_image = jnp.asarray(
                self.image_processor.preprocess(control_image, height=height, width=width))
        if control_image.shape[0] < batch_size:
            control_image = jnp.tile(control_image, (batch_size // control_image.shape[0], 1, 1, 1))
        blocks_repeat = controlnet.input_hint_block is not None
        if controlnet.input_hint_block is None:
            ci = vae.encode(vae_params, control_image).sample(ctrl_key)
            shift = vae.config.get("shift_factor") or 0.0
            ci = (ci - shift) * vae.config.scaling_factor
            control_cond = self._pack_latents(ci)
        else:
            control_cond = jnp.transpose(control_image, (0, 2, 3, 1))

        mode_arr = None
        if controlnet.union:
            if control_mode is None:
                raise ValueError("`control_mode` is required for a ControlNet-Union model")
            mode_arr = jnp.full((batch_size, 1), int(control_mode), dtype=jnp.int32)

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
        img_ids = self._prepare_latent_image_ids(lh // 2, lw // 2)

        ids = np.concatenate([txt_ids, img_ids], axis=0)
        rope_cos, rope_sin = transformer.pos_embed({}, ids)
        if controlnet.union:
            cn_ids = np.concatenate([txt_ids[:1], txt_ids, img_ids], axis=0)
            cn_rope_cos, cn_rope_sin = controlnet.pos_embed({}, cn_ids)
        else:
            cn_rope_cos, cn_rope_sin = rope_cos, rope_sin

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

        denoise = self._jit(
            "denoise_cn_inpaint",
            partial(self._denoise_cn_inpaint, conditioning_scale=controlnet_conditioning_scale,
                    blocks_repeat=blocks_repeat),
            static=(controlnet_conditioning_scale, blocks_repeat),
        )
        latents = denoise(
            transformer_params, cn_params, latents, packed_image, noise, packed_mask,
            prompt_embeds, pooled_prompt_embeds,
            jnp.asarray(rope_cos), jnp.asarray(rope_sin),
            jnp.asarray(cn_rope_cos), jnp.asarray(cn_rope_sin),
            timesteps, state, guidance, control_cond, mode_arr,
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
