"""DeepFloyd IF stage-II/III super-resolution pipeline.

Behavioral mirror of the reference
`pipelines/deepfloyd_if/pipeline_if_superresolution.py`: the low-res
image is bilinearly upscaled with align_corners=True (`:790`), noised to
`noise_level` with the separate image-noising DDPM (`:794`), channel-
concatenated to the intermediate images each step (`:807`), and the UNet
receives `noise_level` as `class_labels` (`:817`); CFG variance split as
in stage I.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline
from .pipeline_if import IFPipelineOutput

logger = logging.get_logger(__name__)


def _bilinear_align_corners(image: jax.Array, size) -> jax.Array:
    """torch F.interpolate(mode="bilinear", align_corners=True): source
    coordinate = i * (src-1)/(dst-1)."""
    from jax.scipy.ndimage import map_coordinates

    B, C, H, W = image.shape
    out_h, out_w = size
    ys = jnp.linspace(0.0, H - 1.0, out_h) if out_h > 1 else jnp.zeros((1,))
    xs = jnp.linspace(0.0, W - 1.0, out_w) if out_w > 1 else jnp.zeros((1,))
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")

    def one(img2d):
        return map_coordinates(img2d, [yy, xx], order=1)

    return jax.vmap(jax.vmap(one))(image)


class IFSuperResolutionPipeline(DiffusionPipeline):
    _optional_components = ["tokenizer", "text_encoder", "safety_checker", "feature_extractor", "watermarker"]

    def __init__(self, tokenizer, text_encoder, unet, scheduler, image_noising_scheduler,
                 safety_checker=None, feature_extractor=None, watermarker=None,
                 requires_safety_checker: bool = False):
        super().__init__()
        self.register_modules(
            tokenizer=tokenizer, text_encoder=text_encoder, unet=unet, scheduler=scheduler,
            image_noising_scheduler=image_noising_scheduler,
            safety_checker=safety_checker, feature_extractor=feature_extractor, watermarker=watermarker,
        )

    def encode_prompt(self, prompt: List[str], negative_prompt, do_cfg: bool, max_length: int = 77):
        text_encoder, te_params = self.text_encoder

        def encode(texts):
            inputs = self.tokenizer(
                texts, padding="max_length", max_length=max_length, truncation=True,
                return_tensors="np", add_special_tokens=True,
            )
            ids = jnp.asarray(inputs.input_ids)
            mask = jnp.asarray(inputs.attention_mask)
            return text_encoder(te_params, ids, attention_mask=mask).last_hidden_state

        prompt_embeds = encode(prompt)
        negative_embeds = None
        if do_cfg:
            negative_prompt = negative_prompt or ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * len(prompt)
            negative_embeds = encode(negative_prompt)
        return prompt_embeds, negative_embeds

    def _denoise(self, unet_params, images, upscaled, prompt_embeds, noise_level, timesteps, state,
                 guidance_scale, do_cfg):
        unet = self.unet[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            images, sstate = carry
            model_input = jnp.concatenate([images, upscaled], axis=1)
            if do_cfg:
                model_input = jnp.concatenate([model_input, model_input], axis=0)
            noise_pred = unet(
                unet_params, model_input, t,
                encoder_hidden_states=prompt_embeds, class_labels=noise_level,
            ).sample
            C = images.shape[1]
            if do_cfg:
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                uncond = uncond[:, :C]
                text, predicted_variance = text[:, :C], text[:, C:]
                noise_pred = uncond + guidance_scale * (text - uncond)
                noise_pred = jnp.concatenate([noise_pred, predicted_variance], axis=1)
            if self.scheduler.config.get("variance_type") not in ("learned", "learned_range"):
                noise_pred = noise_pred[:, :C]
            out = scheduler.step(sstate, noise_pred, t, images)
            return (out.prev_sample, out.state), None

        (images, _), _ = jax.lax.scan(step_fn, (images, state), timesteps)
        return images

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        image: jax.Array = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 4.0,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        num_images_per_prompt: int = 1,
        height: Optional[int] = None,
        width: Optional[int] = None,
        noise_level: int = 250,
        key: Optional[jax.Array] = None,
        prompt_embeds: Optional[jax.Array] = None,
        negative_prompt_embeds: Optional[jax.Array] = None,
        output_type: str = "np",
        return_dict: bool = True,
    ):
        unet, unet_params = self.unet
        if key is None:
            key = jax.random.PRNGKey(0)
        if isinstance(prompt, str):
            prompt = [prompt]
        height = height or unet.config.sample_size
        width = width or unet.config.sample_size
        do_cfg = guidance_scale > 1.0
        batch_size = len(prompt) if prompt is not None else prompt_embeds.shape[0]
        if noise_level < 0 or noise_level >= self.image_noising_scheduler.config.num_train_timesteps:
            raise ValueError(
                f"`noise_level`: {noise_level} must be in [0, "
                f"{self.image_noising_scheduler.config.num_train_timesteps})"
            )

        if prompt_embeds is None:
            prompt_embeds, negative_prompt_embeds = self.encode_prompt(prompt, negative_prompt, do_cfg)
        if do_cfg:
            prompt_embeds = jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
        if num_images_per_prompt > 1:
            prompt_embeds = jnp.repeat(prompt_embeds, num_images_per_prompt, axis=0)

        state = self.scheduler.set_timesteps(num_inference_steps)
        num_channels = unet.config.in_channels // 2
        key, lat_key = jax.random.split(key)
        images = randn_tensor((batch_size * num_images_per_prompt, num_channels, height, width), key=lat_key)
        images = images * state.init_noise_sigma
        if hasattr(self.scheduler, "prepare"):
            state = self.scheduler.prepare(state, images)

        # prepare the upscaled conditioning image
        image = jnp.asarray(image)
        if image.ndim == 3:
            image = image[None]
        if num_images_per_prompt > 1:
            image = jnp.repeat(image, num_images_per_prompt, axis=0)
        upscaled = _bilinear_align_corners(image.astype(jnp.float32), (height, width))
        nl = jnp.full((upscaled.shape[0],), noise_level, dtype=jnp.int32)
        key, noise_key = jax.random.split(key)
        noise = randn_tensor(upscaled.shape, key=noise_key, dtype=upscaled.dtype)
        # q(x_t | x_0) from the image-noising scheduler's training ladder
        acp = jnp.asarray(self.image_noising_scheduler.alphas_cumprod, dtype=upscaled.dtype)[nl]
        upscaled = (acp**0.5)[:, None, None, None] * upscaled + ((1 - acp) ** 0.5)[:, None, None, None] * noise
        if do_cfg:
            nl = jnp.concatenate([nl, nl], axis=0)

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg),
            static=(guidance_scale, do_cfg, num_inference_steps),
        )
        images = denoise(unet_params, images, upscaled, prompt_embeds, nl, state.timesteps, state)

        if output_type == "np":
            images = np.asarray(jnp.transpose(jnp.clip(images / 2 + 0.5, 0, 1), (0, 2, 3, 1)))
        if not return_dict:
            return (images,)
        return IFPipelineOutput(images=images)
