"""SDXL InstructPix2Pix pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/stable_diffusion_xl/pipeline_stable_diffusion_xl_instruct_pix2pix.py`):
edit-instruction conditioning with triple CFG — [text, image, uncond]
embedding layout, image latents (VAE mode, unscaled) on the channel axis,
combine `uncond + g·(text − image) + g_img·(image − uncond)` — inside one
scanned jit.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ..inpaint_utils import repeat_to_batch
from .pipeline_stable_diffusion_xl import (
    StableDiffusionXLPipeline,
    StableDiffusionXLPipelineOutput,
)

logger = logging.get_logger(__name__)


class StableDiffusionXLInstructPix2PixPipeline(StableDiffusionXLPipeline):
    def _denoise_ip2p(self, unet_params, prompt_embeds, add_text_embeds, add_time_ids,
                      latents, image_latents, state, guidance_scale, image_guidance_scale, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            reps = 3 if do_cfg else 1
            latent_input = jnp.concatenate([latents] * reps, axis=0)
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            # image conditioning rides the channel axis, scheduler-unscaled
            latent_input = jnp.concatenate([latent_input, image_latents], axis=1)
            noise_pred = unet(
                unet_params, latent_input,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds,
                added_cond_kwargs={"text_embeds": add_text_embeds, "time_ids": add_time_ids},
            ).sample
            if do_cfg:
                text, image, uncond = jnp.split(noise_pred, 3, axis=0)
                noise_pred = (
                    uncond
                    + guidance_scale * (text - image)
                    + image_guidance_scale * (image - uncond)
                )
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), state.timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        prompt_2: Optional[Union[str, List[str]]] = None,
        image=None,
        num_inference_steps: int = 100,
        guidance_scale: float = 5.0,
        image_guidance_scale: float = 1.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        negative_prompt_2: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        target_size: Optional[Tuple[int, int]] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0 and image_guidance_scale >= 1.0
        prompt_embeds, negative_embeds, pooled, negative_pooled = self.encode_prompt(
            prompt, prompt_2, negative_prompt, negative_prompt_2, do_cfg
        )
        batch_size = prompt_embeds.shape[0]

        init = jnp.asarray(self.image_processor.preprocess(image))
        h, w = init.shape[-2], init.shape[-1]
        original_size = original_size or (h, w)
        target_size = target_size or (h, w)
        add_time_ids = self._get_add_time_ids(original_size, crops_coords_top_left, target_size, batch_size)

        # [text, image, uncond] layout (reference `_encode_prompt` concat)
        if do_cfg:
            prompt_embeds = jnp.concatenate([prompt_embeds, negative_embeds, negative_embeds], axis=0)
            add_text_embeds = jnp.concatenate([pooled, negative_pooled, negative_pooled], axis=0)
            add_time_ids = jnp.concatenate([add_time_ids] * 3, axis=0)
        else:
            add_text_embeds = pooled

        # MODE of the latent distribution, unscaled (reference prepare_image_latents)
        image_latents = vae.encode(vae_params, init).mode()
        image_latents = repeat_to_batch(image_latents, batch_size, what="image")
        if do_cfg:
            uncond_image_latents = jnp.zeros_like(image_latents)
            image_latents = jnp.concatenate([image_latents, image_latents, uncond_image_latents], axis=0)

        shape = (batch_size, vae.config.latent_channels, h // self.vae_scale_factor, w // self.vae_scale_factor)
        if latents is None:
            key, noise_key = jax.random.split(key)
            latents = randn_tensor(shape, key=noise_key)

        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, latents)

        denoise = self._jit(
            "denoise_ip2p",
            partial(self._denoise_ip2p, guidance_scale=guidance_scale,
                    image_guidance_scale=image_guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, image_guidance_scale, do_cfg),
        )
        latents = denoise(unet_params, prompt_embeds, add_text_embeds, add_time_ids,
                          latents, image_latents, state)

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = self.image_processor.postprocess(decode(vae_params, latents), output_type=output_type)

        if not return_dict:
            return (image_out,)
        return StableDiffusionXLPipelineOutput(images=image_out)
