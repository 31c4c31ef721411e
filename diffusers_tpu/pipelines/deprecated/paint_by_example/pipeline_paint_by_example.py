"""Paint-by-Example: exemplar-guided image inpainting.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/paint_by_example/pipeline_paint_by_example.py:160`,
arXiv:2211.13227): a 9-channel SD-inpaint UNet whose cross-attention context
is ONE token — the CLIP-mapped embedding of the example image — with a
learned unconditional vector as the CFG negative. Channel layout per step:
[latents ‖ masked_image_latents ‖ mask] (`:591`); mask semantics: input 1 =
region to repaint, internally inverted so masked_image keeps the rest
(`:147-153`).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....utils.jax_utils import randn_tensor
from ...stable_diffusion.pipeline_stable_diffusion import (
    StableDiffusionPipeline,
    StableDiffusionPipelineOutput,
)


def prepare_mask_and_masked_image(image, mask):
    """→ (image [B,3,H,W] in [-1,1], binarized repaint-mask [B,1,H,W],
    masked_image = image·(1−mask)) (reference `:58`)."""
    image = np.asarray(image, np.float32)
    if image.ndim == 3:
        image = image[None]
    mask = np.asarray(mask, np.float32)
    if mask.ndim == 2:
        mask = mask[None, None]
    elif mask.ndim == 3:
        mask = mask[None]
    mask = (mask >= 0.5).astype(np.float32)
    keep = 1 - mask  # reference inverts: 1 = keep
    masked_image = image * keep
    return jnp.asarray(image), jnp.asarray(mask), jnp.asarray(masked_image)


class PaintByExamplePipeline(StableDiffusionPipeline):
    def __init__(self, vae, image_encoder, unet, scheduler,
                 safety_checker=None, feature_extractor=None,
                 requires_safety_checker: bool = False):
        # no tokenizer/text encoder: conditioning is the example image
        super(StableDiffusionPipeline, self).__init__()
        self.register_modules(vae=vae, image_encoder=image_encoder, unet=unet,
                              scheduler=scheduler, safety_checker=safety_checker,
                              feature_extractor=feature_extractor)
        self.vae_scale_factor = 2 ** (len(vae[0].config.block_out_channels) - 1)
        from ....image_processor import VaeImageProcessor

        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)

    def _encode_image(self, example_image, do_cfg):
        encoder, enc_params = self.image_encoder
        embeds, uncond = encoder(enc_params, jnp.asarray(example_image), return_uncond_vector=True)
        if do_cfg:
            uncond = jnp.broadcast_to(uncond, (embeds.shape[0],) + uncond.shape[1:])
            embeds = jnp.concatenate([uncond, embeds], axis=0)
        return embeds

    def _denoise_pbe(self, unet_params, image_embeds, latents, mask, masked_latents,
                     guidance_scale, num_inference_steps, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(num_inference_steps)
        latents = latents * state.init_noise_sigma
        if hasattr(scheduler, "prepare"):
            state = scheduler.prepare(state, latents)
        if do_cfg:
            mask = jnp.concatenate([mask, mask], axis=0)
            masked_latents = jnp.concatenate([masked_latents, masked_latents], axis=0)

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            latent_input = jnp.concatenate([latent_input, masked_latents, mask], axis=1)
            t_b = jnp.broadcast_to(t, (latent_input.shape[0],))
            noise_pred = unet(unet_params, latent_input, t_b, encoder_hidden_states=image_embeds).sample
            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (cond - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), state.timesteps)
        return latents

    def __call__(
        self,
        example_image=None,
        image=None,
        mask_image=None,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)

        do_cfg = guidance_scale > 1.0
        init_image, mask, masked_image = prepare_mask_and_masked_image(image, mask_image)
        batch_size = init_image.shape[0]

        image_embeds = self._encode_image(example_image, do_cfg)

        key, enc_key, lat_key = jax.random.split(key, 3)
        masked_latents = vae.encode(vae_params, masked_image).sample(enc_key) * vae.config.scaling_factor
        h_lat, w_lat = masked_latents.shape[-2:]
        # nearest-downsample the repaint mask to latent resolution
        sf_h = mask.shape[-2] // h_lat
        sf_w = mask.shape[-1] // w_lat
        mask_lat = mask[:, :, ::sf_h, ::sf_w][:, :, :h_lat, :w_lat]

        if latents is None:
            latents = randn_tensor((batch_size, vae.config.latent_channels, h_lat, w_lat), key=lat_key)

        denoise = self._jit(
            "denoise_pbe",
            partial(self._denoise_pbe, guidance_scale=guidance_scale,
                    num_inference_steps=num_inference_steps, do_cfg=do_cfg),
            static=(guidance_scale, num_inference_steps, do_cfg),
        )
        latents = denoise(unet_params, image_embeds, latents, mask_lat, masked_latents)

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = decode(vae_params, latents)
            image_out = self.image_processor.postprocess(image_out, output_type=output_type)
        if not return_dict:
            return (image_out, None)
        return StableDiffusionPipelineOutput(images=image_out)
