"""SDXL + ControlNet-XS text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/controlnet_xs/pipeline_controlnet_xs_sd_xl.py`):
the fused `UNetControlNetXSModel` consumes the SDXL micro-conditioning
(text_embeds + time_ids) directly and its output is the final eps
prediction — one model call per scanned step.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...utils.jax_utils import randn_tensor
from ..stable_diffusion_xl.pipeline_stable_diffusion_xl import (
    StableDiffusionXLPipeline,
    StableDiffusionXLPipelineOutput,
)


class StableDiffusionXLControlNetXSPipeline(StableDiffusionXLPipeline):
    def __init__(self, vae, text_encoder, text_encoder_2, tokenizer, tokenizer_2,
                 unet, scheduler, image_encoder=None, feature_extractor=None,
                 force_zeros_for_empty_prompt: bool = True):
        # `unet` is a (UNetControlNetXSModel, params) pair — see the SD
        # variant for the fusion contract.
        super().__init__(
            vae=vae, text_encoder=text_encoder, text_encoder_2=text_encoder_2,
            tokenizer=tokenizer, tokenizer_2=tokenizer_2, unet=unet, scheduler=scheduler,
            image_encoder=image_encoder, feature_extractor=feature_extractor,
            force_zeros_for_empty_prompt=force_zeros_for_empty_prompt,
        )

    def _denoise_xs(self, unet_params, prompt_embeds, add_text_embeds, add_time_ids,
                    latents, cond_image, guidance_scale, num_inference_steps, do_cfg,
                    conditioning_scale):
        unet = self.unet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)
        added = {"text_embeds": add_text_embeds, "time_ids": add_time_ids}

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = unet(
                unet_params, latent_input, t, prompt_embeds,
                controlnet_cond=cond_image, conditioning_scale=conditioning_scale,
                added_cond_kwargs=added,
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), state.timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        prompt_2: Optional[Union[str, List[str]]] = None,
        image=None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        controlnet_conditioning_scale: float = 1.0,
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        cond = jnp.asarray(self.image_processor.preprocess(image)) if not isinstance(image, jnp.ndarray) else image
        cond = jnp.clip((cond + 1) / 2, 0, 1) if float(cond.min()) < 0 else cond
        height = height or cond.shape[-2]
        width = width or cond.shape[-1]

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds, pooled, negative_pooled = self.encode_prompt(
            prompt, prompt_2, negative_prompt, None, do_cfg
        )
        batch_size = prompt_embeds.shape[0]

        original_size = original_size or (height, width)
        target_size = target_size or (height, width)
        add_time_ids = self._get_add_time_ids(original_size, crops_coords_top_left, target_size, batch_size)
        if do_cfg:
            prompt_embeds = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)
            add_text_embeds = jnp.concatenate([negative_pooled, pooled], axis=0)
            add_time_ids = jnp.concatenate([add_time_ids, add_time_ids], axis=0)
            cond = jnp.tile(cond, (2 * batch_size // cond.shape[0], 1, 1, 1))
        else:
            add_text_embeds = pooled

        shape = (batch_size, unet.in_channels, height // self.vae_scale_factor,
                 width // self.vae_scale_factor)
        if latents is None:
            latents = randn_tensor(shape, key=key)

        denoise = self._jit(
            "denoise_xs",
            partial(self._denoise_xs, guidance_scale=guidance_scale,
                    num_inference_steps=num_inference_steps, do_cfg=do_cfg,
                    conditioning_scale=float(controlnet_conditioning_scale)),
            static=(guidance_scale, num_inference_steps, do_cfg,
                    float(controlnet_conditioning_scale)),
        )
        latents = denoise(unet_params, prompt_embeds, add_text_embeds, add_time_ids, latents, cond)

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = decode(vae_params, latents)
            image_out = self.image_processor.postprocess(image_out, output_type=output_type)

        if not return_dict:
            return (image_out,)
        return StableDiffusionXLPipelineOutput(images=image_out)
