"""Qwen-Image inpainting pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/qwenimage/pipeline_qwenimage_inpaint.py`):
strength-truncated schedule from the VAE-encoded input, per-step latent
blending through the packed mask — keep original content re-noised to the
next step's level outside the mask (`:497-560`, step-loop blend). TPU-first:
the blend (and the true-CFG combine) run inside one jitted `lax.scan` with
`(t, t_next, is_last)` scan xs.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...schedulers.scheduling_flow_match_euler_discrete import calculate_shift
from ...utils import logging
from ...utils.jax_utils import randn_tensor
from ..inpaint_utils import (
    as_mask_array,
    check_strength_and_schedule,
    prepare_packed_mask,
    repeat_to_batch,
)
from .pipeline_qwenimage import QwenImagePipelineOutput
from .pipeline_qwenimage_img2img import QwenImageImg2ImgPipeline

logger = logging.get_logger(__name__)


class QwenImageInpaintPipeline(QwenImageImg2ImgPipeline):
    def _denoise_inpaint(self, t_params, latents, image_latents, noise, mask,
                         embeds, embeds_mask, timesteps, state,
                         img_shapes=None, true_cfg_scale=1.0, do_cfg=False):
        transformer = self.transformer[0]
        scheduler = self.scheduler
        n = timesteps.shape[0]
        t_next = jnp.concatenate([timesteps[1:], timesteps[-1:]])
        is_last = (jnp.arange(n) == n - 1)

        def step_fn(carry, xs):
            t, tn, last = xs
            latents, sstate = carry
            latent_input = jnp.concatenate([latents, latents], axis=0) if do_cfg else latents
            timestep = jnp.broadcast_to(t, (latent_input.shape[0],)) / 1000.0
            noise_pred = transformer(
                t_params, latent_input, embeds, embeds_mask, timestep, img_shapes=img_shapes
            ).sample
            if do_cfg:
                uncond, cond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + true_cfg_scale * (cond - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            proper = jnp.where(
                last, image_latents, scheduler.scale_noise(sstate, image_latents, tn, noise)
            )
            blended = (1.0 - mask) * proper + mask * out.prev_sample
            return (blended, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), (timesteps, t_next, is_last))
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        image=None,
        mask_image=None,
        strength: float = 0.6,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        true_cfg_scale: float = 4.0,
        key: Optional[jax.Array] = None,
        max_sequence_length: int = 1024,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, t_params = self.transformer
        if key is None:
            key = jax.random.PRNGKey(0)

        init = jnp.asarray(self.image_processor.preprocess(image, height, width))
        height = height or init.shape[-2]
        width = width or init.shape[-1]
        mask = as_mask_array(mask_image)

        do_cfg = true_cfg_scale > 1.0
        embeds, embeds_mask, neg_embeds, neg_mask = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length
        )
        batch_size = embeds.shape[0]
        if do_cfg:
            embeds = jnp.concatenate([neg_embeds, embeds], axis=0)
            embeds_mask = jnp.concatenate([neg_mask, embeds_mask], axis=0)

        key, enc_key, noise_key = jax.random.split(key, 3)
        image_latents = self._encode_vae_image(init, enc_key)
        image_latents = repeat_to_batch(image_latents, batch_size, what="image")
        num_channels_latents = image_latents.shape[1]
        lh, lw = image_latents.shape[2], image_latents.shape[3]
        packed_image = self._pack_latents(image_latents)
        img_shapes = [(1, lh // 2, lw // 2)]

        # pixel mask → latent-res nearest resize → channel-repeat → pack
        packed_mask = prepare_packed_mask(mask, batch_size, num_channels_latents, lh, lw, self._pack_latents)

        sigmas = np.linspace(1.0, 1 / num_inference_steps, num_inference_steps)
        mu = calculate_shift(
            packed_image.shape[1],
            self.scheduler.config.get("base_image_seq_len", 256),
            self.scheduler.config.get("max_image_seq_len", 4096),
            self.scheduler.config.get("base_shift", 0.5),
            self.scheduler.config.get("max_shift", 1.15),
        )
        try:
            state = self.scheduler.set_timesteps(num_inference_steps, sigmas=sigmas, mu=mu)
        except (TypeError, ValueError):
            state = self.scheduler.set_timesteps(num_inference_steps)

        init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
        t_start = max(num_inference_steps - init_timestep, 0)
        timesteps = state.timesteps[t_start:]
        check_strength_and_schedule(strength, timesteps)

        noise = randn_tensor(packed_image.shape, key=noise_key)
        latents = self.scheduler.scale_noise(state, packed_image, timesteps[:1], noise)

        denoise = self._jit(
            "denoise_inpaint",
            partial(self._denoise_inpaint, img_shapes=tuple(img_shapes),
                    true_cfg_scale=true_cfg_scale, do_cfg=do_cfg),
            static=(tuple(img_shapes), true_cfg_scale, do_cfg),
        )
        latents = denoise(t_params, latents, packed_image, noise, packed_mask,
                          embeds, embeds_mask, timesteps, state)

        image_out = self._decode_packed_latents(latents, height, width, output_type)
        if not return_dict:
            return (image_out,)
        return QwenImagePipelineOutput(images=image_out)
