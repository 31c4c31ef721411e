"""InstructPix2Pix: text-instruction image editing (arXiv:2211.09800).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/stable_diffusion/
pipeline_stable_diffusion_instruct_pix2pix.py:98`): an 8-channel-input SD
UNet conditioned on the encoded source image, with THREE-way classifier-free
guidance over (text+image, image-only, unconditional) — `:425-447`. The
denoise loop is one `lax.scan` with the 3-way batch traced in.

Quirks faithfully kept: the image latents use the distribution MODE (not a
sample) and are NOT multiplied by the VAE scaling factor (reference
`prepare_image_latents`, `:782-808`)."""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp

from ...utils.jax_utils import randn_tensor
from .pipeline_stable_diffusion import StableDiffusionPipeline, StableDiffusionPipelineOutput


class StableDiffusionInstructPix2PixPipeline(StableDiffusionPipeline):
    def encode_prompt_ip2p(self, prompt, negative_prompt, do_cfg):
        """[prompt, negative, negative] layout (reference `_encode_prompt`,
        instruct_pix2pix `:331`: the image-only branch reuses the negative
        text embedding)."""
        embeds = super().encode_prompt(prompt, negative_prompt, do_classifier_free_guidance=do_cfg)
        if not do_cfg:
            return embeds
        negative, text = jnp.split(embeds, 2, axis=0)
        return jnp.concatenate([text, negative, negative], axis=0)

    def _denoise_ip2p(self, unet_params, prompt_embeds, latents, image_latents, state,
                      guidance_scale, image_guidance_scale, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            reps = 3 if do_cfg else 1
            latent_input = jnp.concatenate([latents] * reps, axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            # image conditioning rides the channel axis (NOT scaled by the
            # scheduler — reference `:428-431`)
            latent_input = jnp.concatenate([latent_input, image_latents], axis=1)
            noise_pred = unet(
                unet_params,
                latent_input,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds,
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
        image=None,
        num_inference_steps: int = 100,
        guidance_scale: float = 7.5,
        image_guidance_scale: float = 1.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        # reference gate `:373`: both scales must engage for CFG
        do_cfg = guidance_scale > 1.0 and image_guidance_scale >= 1.0
        prompt_embeds = self.encode_prompt_ip2p(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (3 if do_cfg else 1)

        init = jnp.asarray(self.image_processor.preprocess(image))
        # MODE of the latent distribution, unscaled (reference `:782-808`)
        image_latents = vae.encode(vae_params, init).mode()
        if image_latents.shape[0] < batch_size:
            image_latents = jnp.repeat(image_latents, batch_size // image_latents.shape[0], axis=0)
        if do_cfg:
            uncond_image_latents = jnp.zeros_like(image_latents)
            image_latents = jnp.concatenate([image_latents, image_latents, uncond_image_latents], axis=0)

        h, w = init.shape[-2], init.shape[-1]
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
        latents = denoise(unet_params, prompt_embeds, latents, image_latents, state)

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = decode(vae_params, latents)
            image_out = self.image_processor.postprocess(image_out, output_type=output_type)

        if not return_dict:
            return (image_out,)
        return StableDiffusionPipelineOutput(images=image_out)
