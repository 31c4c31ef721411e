"""Qwen-Image image-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/qwenimage/pipeline_qwenimage_img2img.py`):
VAE-encode the input (Wan-family 3D causal VAE with per-channel
latents_mean/std normalization), strength-truncated flow schedule with
`scale_noise` init, then the base pipeline's true-CFG single-scan denoise.
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
from ..inpaint_utils import check_strength_and_schedule, repeat_to_batch
from .pipeline_qwenimage import QwenImagePipeline, QwenImagePipelineOutput

logger = logging.get_logger(__name__)


class QwenImageImg2ImgPipeline(QwenImagePipeline):
    def _encode_vae_image(self, image: jax.Array, key: jax.Array) -> jax.Array:
        """Pixel image NCHW → normalized latent NCHW (reference
        `pipeline_qwenimage_img2img.py` `_encode_vae_image`: frame axis for
        the 3D VAE + (z-mean)/std normalization)."""
        vae, vae_params = self.vae
        cfg = dict(vae.config)
        if "temperal_downsample" in cfg or "scale_factor_temporal" in cfg:
            latents = vae.encode(vae_params, image[:, :, None]).sample(key)[:, :, 0]
        else:
            latents = vae.encode(vae_params, image).sample(key) * vae.config.scaling_factor
        lm, ls = cfg.get("latents_mean"), cfg.get("latents_std")
        if lm is not None and ls is not None:
            mean = jnp.asarray(lm).reshape(1, -1, 1, 1)
            std = jnp.asarray(ls).reshape(1, -1, 1, 1)
            latents = (latents - mean) / std
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        image=None,
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

        do_cfg = true_cfg_scale > 1.0
        embeds, mask, neg_embeds, neg_mask = self.encode_prompt(
            prompt, negative_prompt, do_cfg, max_sequence_length
        )
        batch_size = embeds.shape[0]
        if do_cfg:
            embeds = jnp.concatenate([neg_embeds, embeds], axis=0)
            mask = jnp.concatenate([neg_mask, mask], axis=0)

        key, enc_key, noise_key = jax.random.split(key, 3)
        image_latents = self._encode_vae_image(init, enc_key)
        image_latents = repeat_to_batch(image_latents, batch_size, what="image")
        lh, lw = image_latents.shape[2], image_latents.shape[3]
        packed_image = self._pack_latents(image_latents)
        img_shapes = [(1, lh // 2, lw // 2)]

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
            "denoise",
            partial(self._denoise, img_shapes=tuple(img_shapes),
                    true_cfg_scale=true_cfg_scale, do_cfg=do_cfg),
            static=(tuple(img_shapes), true_cfg_scale, do_cfg),
        )
        latents = denoise(t_params, latents, embeds, mask, timesteps, state)

        image_out = self._decode_packed_latents(latents, height, width, output_type)
        if not return_dict:
            return (image_out,)
        return QwenImagePipelineOutput(images=image_out)
