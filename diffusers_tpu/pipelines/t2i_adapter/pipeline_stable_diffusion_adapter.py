"""StableDiffusionAdapterPipeline — text-to-image with T2I-Adapter control.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/t2i_adapter/
pipeline_stable_diffusion_adapter.py:130`): adapter features are computed
ONCE from the control image (they do not depend on the timestep) and added
inside the UNet's down blocks every denoise step via
`down_intrablock_additional_residuals`."""

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


class StableDiffusionAdapterPipeline(StableDiffusionPipeline):
    def __init__(self, vae, text_encoder, tokenizer, unet, adapter, scheduler):
        from ...image_processor import VaeImageProcessor
        from ..pipeline_utils import DiffusionPipeline

        DiffusionPipeline.__init__(self)
        self.register_modules(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer, unet=unet,
            adapter=adapter, scheduler=scheduler,
        )
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1)
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)

    def _denoise_adapter(self, unet_params, prompt_embeds, latents, adapter_states, state,
                         guidance_scale, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = unet(
                unet_params,
                latent_input,
                jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds,
                down_intrablock_additional_residuals=[jnp.copy(f) for f in adapter_states],
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
        adapter_conditioning_scale: Union[float, List[float]] = 1.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        adapter, adapter_params = self.adapter
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_classifier_free_guidance=do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        # control image in [0, 1] (reference `_preprocess_adapter_image`)
        control = jnp.asarray(self.image_processor.preprocess(image, height=height, width=width))
        if control.min() < 0:
            control = control / 2 + 0.5  # adapter consumes [0, 1]
        from ...models.adapter import MultiAdapter

        if isinstance(adapter, MultiAdapter):
            weights = adapter_conditioning_scale if isinstance(adapter_conditioning_scale, list) else None
            adapter_states = adapter(adapter_params, control, adapter_weights=weights)
        else:
            adapter_states = adapter(adapter_params, control)
            adapter_states = [f * adapter_conditioning_scale for f in adapter_states]
        if do_cfg:
            adapter_states = [jnp.concatenate([f, f], axis=0) for f in adapter_states]

        h = control.shape[-2]
        w = control.shape[-1]
        shape = (batch_size, vae.config.latent_channels, h // self.vae_scale_factor, w // self.vae_scale_factor)
        if latents is None:
            key, noise_key = jax.random.split(key)
            latents = randn_tensor(shape, key=noise_key)

        state = self.scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, latents)

        denoise = self._jit(
            "denoise_adapter",
            partial(self._denoise_adapter, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg),
        )
        latents = denoise(unet_params, prompt_embeds, latents, adapter_states, state)

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = decode(vae_params, latents)
            image_out = self.image_processor.postprocess(image_out, output_type=output_type)

        if not return_dict:
            return (image_out,)
        return StableDiffusionPipelineOutput(images=image_out)
