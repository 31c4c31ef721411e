"""Legacy Stable Diffusion inpainting (4-channel UNet).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/stable_diffusion_variants/pipeline_stable_diffusion_inpaint_legacy.py:96`):
img2img-style start from the noised init image, then after EVERY step the
preserved region is re-projected onto the properly-noised original
(`latents = init_proper·mask + latents·(1−mask)`, `:751-757`) and the final
latents get one last clean blend (`:767`). White mask pixels are repainted,
black preserved (`preprocess_mask`, `:59`).

TPU-native: the per-step blend lives inside the scanned step function; the
mask and the original latents are scan constants.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....utils.jax_utils import randn_tensor
from ...stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipelineOutput
from ...stable_diffusion.pipeline_stable_diffusion_img2img import StableDiffusionImg2ImgPipeline


def preprocess_mask(mask, batch_size: int, scale_factor: int = 8) -> np.ndarray:
    """PIL/array mask → latent-res keep-mask (1 = keep) (reference `:50`)."""
    if hasattr(mask, "convert"):  # PIL
        mask = mask.convert("L")
        w, h = mask.size
        w, h = (x - x % 8 for x in (w, h))
        mask = mask.resize((w // scale_factor, h // scale_factor), resample=0)  # nearest
        mask = np.array(mask).astype(np.float32) / 255.0
        mask = np.tile(mask, (4, 1, 1))
        mask = np.vstack([mask[None]] * batch_size)
        return 1 - mask  # repaint white, keep black
    mask = np.asarray(mask, dtype=np.float32)
    if mask.ndim == 4 and mask.shape[3] in (1, 3):
        mask = mask.transpose(0, 3, 1, 2)
    mask = mask.mean(axis=1, keepdims=True)
    h, w = mask.shape[-2:]
    mask = mask[:, :, :: scale_factor, :: scale_factor][:, :, : h // scale_factor, : w // scale_factor]
    return np.broadcast_to(mask, (batch_size, 4) + mask.shape[-2:]).copy()


class StableDiffusionInpaintPipelineLegacy(StableDiffusionImg2ImgPipeline):
    def _denoise_legacy(self, unet_params, prompt_embeds, latents, init_latents_orig, mask,
                        noise, timesteps, state, guidance_scale, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            noise_pred = unet(
                unet_params, latent_input, jnp.broadcast_to(t, (latent_input.shape[0],)),
                encoder_hidden_states=prompt_embeds).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            # masking: keep region re-projected onto the noised original
            init_proper = scheduler.add_noise(sstate, init_latents_orig, noise,
                                              jnp.broadcast_to(t, (1,)))
            latents = init_proper * mask + out.prev_sample * (1 - mask)
            return (latents, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        # final clean blend (reference `:767`)
        return init_latents_orig * mask + latents * (1 - mask)

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        image=None,
        mask_image=None,
        strength: float = 0.8,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        key: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        if key is None:
            key = jax.random.PRNGKey(0)
        if not 0 <= strength <= 1:
            raise ValueError(f"strength must be in [0, 1], got {strength}")

        do_cfg = guidance_scale > 1.0
        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)

        init = jnp.asarray(self.image_processor.preprocess(image))
        key, enc_key, noise_key = jax.random.split(key, 3)
        init_latents = vae.encode(vae_params, init).sample(enc_key) * vae.config.scaling_factor
        if init_latents.shape[0] < batch_size:
            init_latents = jnp.repeat(init_latents, batch_size // init_latents.shape[0], axis=0)
        init_latents_orig = init_latents

        mask = jnp.asarray(preprocess_mask(mask_image, batch_size, self.vae_scale_factor))
        if mask.shape[-2:] != init_latents.shape[-2:]:
            raise ValueError(f"mask {mask.shape} does not match latents {init_latents.shape}")

        state = self.scheduler.set_timesteps(num_inference_steps)
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, init_latents)
        timesteps, _ = self.get_timesteps(state, num_inference_steps, strength)

        noise = randn_tensor(init_latents.shape, key=noise_key)
        latents = self.scheduler.add_noise(state, init_latents, noise, timesteps[:1])

        denoise = self._jit("denoise_legacy",
                            partial(self._denoise_legacy, guidance_scale=guidance_scale, do_cfg=do_cfg),
                            static=(guidance_scale, do_cfg))
        latents = denoise(unet_params, prompt_embeds, latents, init_latents_orig, mask,
                          noise, timesteps, state)

        if output_type == "latent":
            image_out = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image_out = decode(vae_params, latents)
            image_out = self.image_processor.postprocess(image_out, output_type=output_type)
        if not return_dict:
            return (image_out,)
        return StableDiffusionPipelineOutput(images=image_out)
