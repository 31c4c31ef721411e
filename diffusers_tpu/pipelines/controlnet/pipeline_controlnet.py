"""Stable Diffusion + ControlNet text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/controlnet/pipeline_controlnet.py`):
the ControlNet runs inside the scanned denoise loop, emitting residuals that
feed the UNet — both in the same jitted graph.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ..stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipeline, StableDiffusionPipelineOutput

logger = logging.get_logger(__name__)


class StableDiffusionControlNetPipeline(StableDiffusionPipeline):
    def __init__(
        self,
        vae,
        text_encoder,
        tokenizer,
        unet,
        controlnet,
        scheduler,
        safety_checker=None,
        feature_extractor=None,
        image_encoder=None,
        requires_safety_checker: bool = False,
    ):
        super().__init__(
            vae=vae,
            text_encoder=text_encoder,
            tokenizer=tokenizer,
            unet=unet,
            scheduler=scheduler,
            safety_checker=safety_checker,
            feature_extractor=feature_extractor,
            image_encoder=image_encoder,
            requires_safety_checker=requires_safety_checker,
        )
        # A list of (model, params) pairs wraps into MultiControlNetModel,
        # mirroring reference `pipeline_controlnet.py` __init__ auto-wrap.
        if isinstance(controlnet, (list, tuple)) and controlnet and isinstance(controlnet[0], tuple):
            from ...models.controlnets.multicontrolnet import MultiControlNetModel

            controlnet = (MultiControlNetModel([m for m, _ in controlnet]), [p for _, p in controlnet])
        self.register_modules(controlnet=controlnet)

    def _denoise_controlnet(
        self, unet_params, cn_params, prompt_embeds, latents, cond_image,
        guidance_scale, num_inference_steps, do_cfg, conditioning_scale, guess_mode,
    ):
        unet = self.unet[0]
        controlnet = self.controlnet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            t_b = jnp.broadcast_to(t, (latent_input.shape[0],))
            cn_out = controlnet(
                cn_params, latent_input, t_b, prompt_embeds, cond_image,
                conditioning_scale=conditioning_scale, guess_mode=guess_mode,
            )
            noise_pred = unet(
                unet_params,
                latent_input,
                t_b,
                encoder_hidden_states=prompt_embeds,
                down_block_additional_residuals=cn_out.down_block_res_samples,
                mid_block_additional_residual=cn_out.mid_block_res_sample,
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
        guess_mode: bool = False,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        controlnet, cn_params = self.controlnet
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        from ...models.controlnets.multicontrolnet import MultiControlNetModel

        is_multi = isinstance(controlnet, MultiControlNetModel)
        images = list(image) if is_multi else [image]

        def _prep(im):
            im = jnp.asarray(self.image_processor.preprocess(im)) if not isinstance(im, jnp.ndarray) else im
            # controlnet conditioning stays in [0, 1]
            return jnp.clip((im + 1) / 2, 0, 1) if float(im.min()) < 0 else im

        conds = [_prep(im) for im in images]
        height = height or conds[0].shape[-2]
        width = width or conds[0].shape[-1]

        do_cfg = guidance_scale > 1.0
        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)
        if do_cfg:
            conds = [jnp.tile(c, (2 * batch_size // c.shape[0], 1, 1, 1)) for c in conds]
        cond = conds if is_multi else conds[0]
        if is_multi and not isinstance(controlnet_conditioning_scale, (list, tuple)):
            controlnet_conditioning_scale = (controlnet_conditioning_scale,) * len(controlnet)
        if isinstance(controlnet_conditioning_scale, list):
            controlnet_conditioning_scale = tuple(controlnet_conditioning_scale)

        shape = (batch_size, unet.config.in_channels, height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            latents = randn_tensor(shape, key=key)

        denoise = self._jit(
            "denoise",
            partial(
                self._denoise_controlnet,
                guidance_scale=guidance_scale,
                num_inference_steps=num_inference_steps,
                do_cfg=do_cfg,
                conditioning_scale=controlnet_conditioning_scale,
                guess_mode=guess_mode,
            ),
            static=(guidance_scale, num_inference_steps, do_cfg, controlnet_conditioning_scale, guess_mode),
        )
        latents = denoise(unet_params, cn_params, prompt_embeds, latents, cond)

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = decode(vae_params, latents)
            image_out = self.image_processor.postprocess(image_out, output_type=output_type)

        if not return_dict:
            return (image_out,)
        return StableDiffusionPipelineOutput(images=image_out)
