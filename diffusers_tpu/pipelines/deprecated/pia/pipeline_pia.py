"""PIA — Personalized Image Animator (deprecated family).

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/pia/pipeline_pia.py:560`
PIAPipeline): an AnimateDiff motion UNet whose ``conv_in`` takes 9 channels —
4 noisy latents ‖ 1 motion-strength mask ‖ 4 condition-image latents — where
the per-frame mask coefficient encodes how strongly each frame is pinned to
the input image (`prepare_mask_coef_by_statistics`, `:106`; RANGE_list
motion-scale table `:93`).

TPU-first: the condition latents + mask are prepared once host-side, the
channel concat happens inside the single scanned/jitted denoise (XLA folds it
into conv_in), and free-init iterations reuse AnimateDiff's machinery.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....utils.jax_utils import randn_tensor
from ....utils.outputs import BaseOutput
from ...animatediff.pipeline_animatediff import AnimateDiffPipeline

# motion-scale → per-frame pin coefficients (reference RANGE_list, `:93-103`)
RANGE_LIST = [
    [1.0, 0.9, 0.85, 0.85, 0.85, 0.8],                                          # 0 small motion
    [1.0, 0.8, 0.8, 0.8, 0.79, 0.78, 0.75],                                      # 1 moderate
    [1.0, 0.8, 0.7, 0.7, 0.7, 0.7, 0.7, 0.7, 0.7, 0.7, 0.6, 0.5, 0.5],           # 2 large
    [1.0, 0.9, 0.85, 0.85, 0.85, 0.8, 0.8, 0.8, 0.8, 0.8, 0.8, 0.8, 0.85, 0.85, 0.9, 1.0],  # 3 loop
    [1.0, 0.8, 0.8, 0.8, 0.79, 0.78, 0.75, 0.75, 0.75, 0.75, 0.75, 0.78, 0.79, 0.8, 0.8, 1.0],
    [1.0, 0.8, 0.7, 0.7, 0.7, 0.7, 0.6, 0.5, 0.5, 0.6, 0.7, 0.7, 0.7, 0.7, 0.8, 1.0],
    [0.5, 0.4, 0.4, 0.4, 0.35, 0.3],                                             # 6 style xfer small
    [0.5, 0.4, 0.4, 0.4, 0.35, 0.35, 0.3, 0.25, 0.2],                            # 7 style xfer moderate
    [0.5, 0.2],                                                                  # 8 style xfer large
]


def prepare_mask_coef_by_statistics(num_frames: int, cond_frame: int, motion_scale: int):
    """Per-frame pin strength, decaying with distance from the condition
    frame (reference `:106-127`)."""
    if num_frames <= cond_frame:
        raise ValueError("num_frames must be greater than cond_frame")
    if not 0 <= motion_scale < len(RANGE_LIST):
        raise ValueError(f"motion_scale {motion_scale} not implemented")
    coef = list(RANGE_LIST[motion_scale])
    coef = coef + [coef[-1]] * (num_frames - len(coef))
    order = [abs(i - cond_frame) for i in range(num_frames)]
    return [coef[order[i]] for i in range(num_frames)]


@dataclass
class PIAPipelineOutput(BaseOutput):
    frames: np.ndarray


class PIAPipeline(AnimateDiffPipeline):
    """Image-to-video with motion-strength control (reference `:560`)."""

    def _denoise_pia(self, unet_params, prompt_embeds, latents, mask, masked_image,
                     timesteps, state, guidance_scale, do_cfg, image_embeds=None):
        unet = self.unet[0]
        scheduler = self.scheduler
        added_cond_kwargs = {"image_embeds": image_embeds} if image_embeds is not None else None

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            latent_input = scheduler.scale_model_input(sstate, latent_input, t)
            # 9-channel conv_in: latents ‖ mask ‖ condition latents (reference `:914`)
            latent_input = jnp.concatenate([latent_input, mask, masked_image], axis=1)
            noise_pred = unet(
                unet_params, latent_input, t,
                encoder_hidden_states=prompt_embeds,
                added_cond_kwargs=added_cond_kwargs,
            ).sample
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (text - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def prepare_masked_condition(self, image, batch_size, num_frames, height, width,
                                 do_cfg, enc_key, motion_scale=0):
        """VAE-encode the condition image, broadcast over frames, and build
        the per-frame pin-strength mask (reference `:589-639`)."""
        vae, vae_params = self.vae
        h, w = height // self.vae_scale_factor, width // self.vae_scale_factor
        if not isinstance(image, (jax.Array, jnp.ndarray, np.ndarray)):
            image = jnp.asarray(self.image_processor.preprocess(image, height=height, width=width))
        else:
            image = jnp.asarray(image)
        image_latent = vae.encode(vae_params, image).sample(enc_key)
        if image_latent.shape[-2:] != (h, w):
            image_latent = jax.image.resize(
                image_latent, image_latent.shape[:2] + (h, w), method="bilinear")
        image_latent = image_latent * vae.config.scaling_factor
        if image_latent.shape[0] != batch_size:
            image_latent = jnp.broadcast_to(
                image_latent, (batch_size,) + image_latent.shape[1:])

        coef = jnp.asarray(prepare_mask_coef_by_statistics(num_frames, 0, motion_scale),
                           dtype=image_latent.dtype)
        mask = jnp.broadcast_to(coef.reshape(1, 1, num_frames, 1, 1),
                                (batch_size, 1, num_frames, h, w))
        masked_image = jnp.broadcast_to(
            image_latent[:, :, None], (batch_size, image_latent.shape[1], num_frames, h, w))
        if do_cfg:
            mask = jnp.concatenate([mask, mask], axis=0)
            masked_image = jnp.concatenate([masked_image, masked_image], axis=0)
        return mask, masked_image

    def __call__(
        self,
        image=None,
        prompt: Union[str, List[str]] = None,
        strength: float = 1.0,
        num_frames: int = 16,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        motion_scale: int = 0,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        ip_adapter_image=None,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        vae, vae_params = self.vae
        sample_size = unet.config.sample_size or 64
        height = height or sample_size * self.vae_scale_factor
        width = width or sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)
        key, enc_key, lat_key, noise_key = jax.random.split(key, 4)

        do_cfg = guidance_scale > 1.0
        prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        batch_size = prompt_embeds.shape[0] // (2 if do_cfg else 1)
        prompt_embeds = jnp.repeat(prompt_embeds, num_frames, axis=0)

        image_embeds = None
        if ip_adapter_image is not None:
            image_embeds = self.prepare_ip_adapter_image_embeds(ip_adapter_image, batch_size, do_cfg)

        # strength-truncated schedule (reference get_timesteps, `:641`)
        state = self.scheduler.set_timesteps(num_inference_steps)
        init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
        t_start = max(num_inference_steps - init_timestep, 0)
        timesteps = state.timesteps[t_start:]

        shape = (batch_size, 4, num_frames,
                 height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            latents = randn_tensor(shape, key=lat_key) * state.init_noise_sigma

        mask, masked_image = self.prepare_masked_condition(
            image, batch_size, num_frames, height, width, do_cfg, enc_key,
            motion_scale=motion_scale)
        if strength < 1.0:
            noise = randn_tensor(latents.shape, key=noise_key, dtype=latents.dtype)
            latents = self.scheduler.add_noise(masked_image[:batch_size], noise, timesteps[:1])

        denoise = self._jit(
            "denoise_pia",
            partial(self._denoise_pia, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, strength, num_inference_steps),
        )
        latents = denoise(unet_params, prompt_embeds, latents, mask, masked_image,
                          timesteps, state, image_embeds=image_embeds)

        if output_type == "latent":
            video = latents
        else:
            video = self._jit("decode", self._decode)(vae_params, latents)
            video = np.asarray(jnp.transpose(video, (0, 1, 3, 4, 2)))

        if not return_dict:
            return (video,)
        return PIAPipelineOutput(frames=video)
