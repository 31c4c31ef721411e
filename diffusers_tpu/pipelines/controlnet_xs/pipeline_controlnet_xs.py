"""Stable Diffusion + ControlNet-XS text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/controlnet_xs/pipeline_controlnet_xs.py`):
unlike vanilla ControlNet, the fused `UNetControlNetXSModel` IS the denoiser —
its output is the final eps prediction, so the scanned loop has a single
model call per step.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...utils.jax_utils import randn_tensor
from ..stable_diffusion.pipeline_stable_diffusion import (
    StableDiffusionPipeline,
    StableDiffusionPipelineOutput,
)


class StableDiffusionControlNetXSPipeline(StableDiffusionPipeline):
    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler,
                 safety_checker=None, feature_extractor=None, image_encoder=None,
                 requires_safety_checker: bool = False):
        # `unet` is a (UNetControlNetXSModel, params) pair — the fused model.
        # A (UNet2DConditionModel, ControlNetXSAdapter) pair must be fused by
        # the caller via UNetControlNetXSModel.from_unet first (reference
        # auto-fuses in __init__; our params are explicit so fusion is too).
        super().__init__(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer, unet=unet,
            scheduler=scheduler, safety_checker=safety_checker,
            feature_extractor=feature_extractor, image_encoder=image_encoder,
            requires_safety_checker=requires_safety_checker,
        )

    def _denoise_xs(self, unet_params, prompt_embeds, latents, cond_image,
                    guidance_scale, num_inference_steps, do_cfg, conditioning_scale):
        unet = self.unet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = unet(
                unet_params, latent_input, t, prompt_embeds,
                controlnet_cond=cond_image, conditioning_scale=conditioning_scale,
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
        image=None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        controlnet_conditioning_scale: float = 1.0,
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
        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)
        if do_cfg:
            cond = jnp.tile(cond, (2 * batch_size // cond.shape[0], 1, 1, 1))

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
        latents = denoise(unet_params, prompt_embeds, latents, cond)

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = decode(vae_params, latents)
            image_out = self.image_processor.postprocess(image_out, output_type=output_type)

        if not return_dict:
            return (image_out,)
        return StableDiffusionPipelineOutput(images=image_out)
