"""SDXL inpainting pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/stable_diffusion_xl/pipeline_stable_diffusion_xl_inpaint.py`):
4-channel UNets blend the noised original latents with the denoised latents
through the downsampled mask at every step (inside the single scanned loop);
9-channel inpaint-specialized UNets receive mask + masked-image latents as
extra input channels. SDXL micro-conditioning (text_embeds/time_ids) as in the
base pipeline.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import logging
from ...utils.jax_utils import randn_tensor
from .pipeline_stable_diffusion_xl import StableDiffusionXLPipeline, StableDiffusionXLPipelineOutput

logger = logging.get_logger(__name__)


class StableDiffusionXLInpaintPipeline(StableDiffusionXLPipeline):
    def _denoise_inpaint(
        self, unet_params, prompt_embeds, add_text_embeds, add_time_ids, latents, init_latents,
        mask, mask_latents_input, timesteps, state, noise, guidance_scale, do_cfg, is_inpaint_unet,
    ):
        unet = self.unet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            if is_inpaint_unet:
                latent_input = jnp.concatenate([latent_input, mask_latents_input], axis=1)
            noise_pred = unet(
                unet_params,
                latent_input,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds,
                added_cond_kwargs={"text_embeds": add_text_embeds, "time_ids": add_time_ids},
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            new_latents = out.prev_sample
            if not is_inpaint_unet:
                noised_init = scheduler.add_noise(sstate, init_latents, noise, jnp.broadcast_to(t, (1,)))
                new_latents = (1 - mask) * noised_init + mask * new_latents
            return (new_latents, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        prompt_2: Optional[Union[str, List[str]]] = None,
        image=None,
        mask_image=None,
        strength: float = 1.0,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        negative_prompt_2: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
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

        init = jnp.asarray(self.image_processor.preprocess(image))
        height, width = init.shape[-2], init.shape[-1]
        original_size = original_size or (height, width)
        target_size = target_size or (height, width)

        do_cfg = guidance_scale > 1.0
        prompt_embeds, negative_embeds, pooled, negative_pooled = self.encode_prompt(
            prompt, prompt_2, negative_prompt, negative_prompt_2, do_cfg
        )
        batch_size = prompt_embeds.shape[0]
        add_time_ids = self._get_add_time_ids(original_size, crops_coords_top_left, target_size, batch_size)
        if do_cfg:
            prompt_embeds = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)
            add_text_embeds = jnp.concatenate([negative_pooled, pooled], axis=0)
            add_time_ids = jnp.concatenate([add_time_ids, add_time_ids], axis=0)
        else:
            add_text_embeds = pooled

        mask = np.asarray(mask_image, dtype=np.float32)
        if mask.ndim == 2:
            mask = mask[None, None]
        elif mask.ndim == 3:
            mask = mask[None]
        mask = (mask > 0.5).astype(np.float32)

        key, enc_key, noise_key = jax.random.split(key, 3)
        init_latents = vae.encode(vae_params, init).sample(enc_key) * vae.config.scaling_factor
        if init_latents.shape[0] < batch_size:
            init_latents = jnp.repeat(init_latents, batch_size // init_latents.shape[0], axis=0)

        lh, lw = init_latents.shape[2], init_latents.shape[3]
        sf_h, sf_w = mask.shape[2] // lh, mask.shape[3] // lw
        mask_latent = jnp.asarray(mask[:, :, :: max(sf_h, 1), :: max(sf_w, 1)][:, :, :lh, :lw])

        is_inpaint_unet = unet.config.in_channels == 9
        state = self.scheduler.set_timesteps(num_inference_steps)
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, init_latents)
        timesteps = state.timesteps

        noise = randn_tensor(init_latents.shape, key=noise_key)
        if strength >= 1.0:
            latents = noise * state.init_noise_sigma
        else:
            init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
            t_start = max(num_inference_steps - init_timestep, 0)
            timesteps = timesteps[t_start * self.scheduler.order :]
            latents = self.scheduler.add_noise(state, init_latents, noise, timesteps[:1])

        mask_latents_input = None
        if is_inpaint_unet:
            masked_image = init * (1 - jnp.asarray(mask))
            masked_latents = vae.encode(vae_params, masked_image).mode() * vae.config.scaling_factor
            reps = 2 if do_cfg else 1
            mask_latents_input = jnp.concatenate(
                [jnp.repeat(mask_latent, batch_size, axis=0), masked_latents], axis=1
            )
            mask_latents_input = jnp.tile(mask_latents_input, (reps, 1, 1, 1))

        denoise = self._jit(
            "denoise",
            partial(
                self._denoise_inpaint,
                guidance_scale=guidance_scale,
                do_cfg=do_cfg,
                is_inpaint_unet=is_inpaint_unet,
            ),
            static=(guidance_scale, do_cfg, is_inpaint_unet),
        )
        latents = denoise(
            unet_params, prompt_embeds, add_text_embeds, add_time_ids, latents, init_latents,
            mask_latent, mask_latents_input, timesteps, state, noise,
        )

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = decode(vae_params, latents)
            image_out = self.image_processor.postprocess(image_out, output_type=output_type)

        if not return_dict:
            return (image_out,)
        return StableDiffusionXLPipelineOutput(images=image_out)
