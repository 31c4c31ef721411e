"""OmniGen unified image-generation pipeline.

Behavioral mirror of the reference
`pipelines/omnigen/pipeline_omnigen.py`: multimodal prompt processing
with [cond, negative, image-cfg] branches, input-image VAE encoding,
flow-match Euler over `sigmas = linspace(1, 0)[:N]` (`:412`), 3-way
guidance `uncond + s_img (img - uncond) + s_txt (cond - img)` (`:456`).
TPU-first: one jitted `lax.scan`; the multimodal conditioning tensors are
built host-side once.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline
from .processor_omnigen import OmniGenMultiModalProcessor

logger = logging.get_logger(__name__)


@dataclass
class ImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class OmniGenPipeline(DiffusionPipeline):
    def __init__(self, transformer, scheduler, vae, tokenizer):
        super().__init__()
        self.register_modules(transformer=transformer, scheduler=scheduler, vae=vae, tokenizer=tokenizer)
        self.vae_scale_factor = 2 ** (len(self.vae[0].config.block_out_channels) - 1) if vae is not None else 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor)
        patch = self.transformer[0].config.patch_size if transformer is not None else 2
        self.multimodal_processor = OmniGenMultiModalProcessor(
            tokenizer, max_image_size=1024,
            token_divisor=(self.vae_scale_factor * patch) ** 2,
        )
        self.default_sample_size = 128

    def encode_input_images(self, pixel_values, key):
        vae, vae_params = self.vae
        latents = []
        for img in pixel_values:
            key, sub = jax.random.split(key)
            posterior = vae.encode(vae_params, jnp.asarray(img))
            latents.append(posterior.sample(sub) * vae.config.scaling_factor)
        return latents

    def _denoise(self, tr_params, latents, input_ids, attention_mask, position_ids,
                 timesteps, state, input_img_latents=None, input_image_sizes=None,
                 guidance_scale=2.5, img_guidance_scale=1.6, num_cfg=1,
                 num_train_timesteps=1000):
        transformer = self.transformer[0]
        scheduler = self.scheduler

        def step_fn(carry, t):
            latents, sstate = carry
            latent_input = jnp.concatenate([latents] * (num_cfg + 1), axis=0)
            noise_pred = transformer(
                tr_params, latent_input, t / num_train_timesteps,
                input_ids=input_ids, input_img_latents=input_img_latents,
                input_image_sizes=input_image_sizes, attention_mask=attention_mask,
                position_ids=position_ids,
            ).sample
            if num_cfg == 2:
                cond, uncond, img_cond = jnp.split(noise_pred, 3, axis=0)
                noise_pred = (uncond + img_guidance_scale * (img_cond - uncond)
                              + guidance_scale * (cond - img_cond))
            else:
                cond, uncond = jnp.split(noise_pred, 2, axis=0)
                noise_pred = uncond + guidance_scale * (cond - uncond)
            out = scheduler.step(sstate, noise_pred, t, latents)
            return (out.prev_sample, out.state), None

        (latents, _), _ = jax.lax.scan(step_fn, (latents, state), timesteps)
        return latents

    def __call__(
        self,
        prompt: Union[str, List[str]],
        input_images=None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_inference_steps: int = 50,
        max_input_image_size: int = 1024,
        guidance_scale: float = 2.5,
        img_guidance_scale: float = 1.6,
        use_input_image_size_as_output: bool = False,
        num_images_per_prompt: int = 1,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        transformer, tr_params = self.transformer
        vae, vae_params = self.vae
        height = height or self.default_sample_size * self.vae_scale_factor
        width = width or self.default_sample_size * self.vae_scale_factor
        if key is None:
            key = jax.random.PRNGKey(0)
        num_cfg = 2 if input_images is not None else 1
        use_img_cfg = input_images is not None
        if isinstance(prompt, str):
            prompt = [prompt]
            input_images = [input_images]
        batch_size = len(prompt)

        if max_input_image_size != self.multimodal_processor.max_image_size:
            self.multimodal_processor.reset_max_image_size(max_input_image_size)
        processed = self.multimodal_processor(
            prompt, input_images, height=height, width=width, use_img_cfg=use_img_cfg,
            use_input_image_size_as_output=use_input_image_size_as_output,
            num_images_per_prompt=num_images_per_prompt,
        )

        key, enc_key = jax.random.split(key)
        input_img_latents = self.encode_input_images(processed["input_pixel_values"], enc_key)

        if use_input_image_size_as_output:
            height, width = processed["input_pixel_values"][0].shape[-2:]

        sigmas = np.linspace(1, 0, num_inference_steps + 1)[:num_inference_steps]
        state = self.scheduler.set_timesteps(num_inference_steps, sigmas=sigmas)

        shape = (batch_size * num_images_per_prompt, transformer.config.in_channels,
                 height // self.vae_scale_factor, width // self.vae_scale_factor)
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor(shape, key=lat_key)

        num_train_timesteps = self.scheduler.config.get("num_train_timesteps", 1000)
        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale,
                    img_guidance_scale=img_guidance_scale, num_cfg=num_cfg,
                    num_train_timesteps=num_train_timesteps,
                    input_image_sizes=processed["input_image_sizes"],
                    input_img_latents=input_img_latents),
            static=(guidance_scale, img_guidance_scale, num_cfg, num_inference_steps,
                    str(processed["input_image_sizes"])),
        )
        latents = denoise(
            tr_params, latents, jnp.asarray(processed["input_ids"]),
            jnp.asarray(processed["attention_mask"]), jnp.asarray(processed["position_ids"]),
            state.timesteps, state,
        )

        if output_type == "latent":
            image = latents
        else:
            decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
            image = decode(vae_params, latents)
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return ImagePipelineOutput(images=image)
