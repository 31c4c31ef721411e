"""Kandinsky 5.0 text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/kandinsky5/pipeline_kandinsky_t2i.py:120`
Kandinsky5T2IPipeline): image chat template with 41-token prefix drop
(`:178-179`), fixed resolution bucket list with nearest-aspect snap
(`:183,:628-630`), single-latent-frame channels-last latents, unit RoPE
scale factor (`:713`), plain `AutoencoderKL` decode (`:804`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...image_processor import VaeImageProcessor
from ...utils import BaseOutput, logging
from ...utils.jax_utils import randn_tensor
from ..pipeline_utils import DiffusionPipeline
from .pipeline_kandinsky5 import Kandinsky5T2VPipeline

logger = logging.get_logger(__name__)

T2I_PROMPT_TEMPLATE = (
    "<|im_start|>system\nYou are a promt engineer. Describe the image by detailing the color, shape, size, "
    "texture, quantity, text, spatial relationships of the objects and background:<|im_end|>\n"
    "<|im_start|>user\n{}<|im_end|>"
)
T2I_TEMPLATE_START_IDX = 41

RESOLUTIONS = [(1024, 1024), (640, 1408), (1408, 640), (768, 1280), (1280, 768), (896, 1152), (1152, 896)]


@dataclass
class KandinskyImagePipelineOutput(BaseOutput):
    images: Union[List, np.ndarray]


class Kandinsky5T2IPipeline(DiffusionPipeline):
    _supported_cache_configs = ("TaylorSeerCacheConfig", "MagCacheConfig")

    def __init__(self, transformer, vae, text_encoder, tokenizer, text_encoder_2, tokenizer_2, scheduler):
        super().__init__()
        self.register_modules(
            transformer=transformer, vae=vae, text_encoder=text_encoder, tokenizer=tokenizer,
            text_encoder_2=text_encoder_2, tokenizer_2=tokenizer_2, scheduler=scheduler,
        )
        self.prompt_template = T2I_PROMPT_TEMPLATE
        self.prompt_template_encode_start_idx = T2I_TEMPLATE_START_IDX
        self.resolutions = list(RESOLUTIONS)
        self.vae_scale_factor_spatial = 8
        self.image_processor = VaeImageProcessor(vae_scale_factor=self.vae_scale_factor_spatial)

    _encode_prompt_qwen = Kandinsky5T2VPipeline._encode_prompt_qwen
    _encode_prompt_clip = Kandinsky5T2VPipeline._encode_prompt_clip
    encode_prompt = Kandinsky5T2VPipeline.encode_prompt
    _denoise = Kandinsky5T2VPipeline._denoise

    def __call__(
        self,
        prompt: Union[str, List[str]] = None,
        negative_prompt: Optional[Union[str, List[str]]] = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 50,
        guidance_scale: float = 3.5,
        key: Optional[jax.Array] = None,
        latents: Optional[jax.Array] = None,
        max_sequence_length: int = 512,
        output_type: str = "pil",
        return_dict: bool = True,
    ):
        from functools import partial

        transformer, t_params = self.transformer
        if key is None:
            key = jax.random.PRNGKey(0)

        if (width, height) not in self.resolutions:
            width, height = self.resolutions[
                int(np.argmin([abs((r[0] / r[1]) - (width / height)) for r in self.resolutions]))
            ]
            logger.warning(f"Resolution snapped to the nearest supported bucket: {width}x{height}")

        do_cfg = guidance_scale > 1.0
        embeds_qwen, embeds_clip, _ = self.encode_prompt(prompt, max_sequence_length)
        batch_size = embeds_qwen.shape[0]
        neg_qwen = neg_clip = None
        if do_cfg:
            negative_prompt = negative_prompt if negative_prompt is not None else ""
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * batch_size
            neg_qwen, neg_clip, _ = self.encode_prompt(negative_prompt, max_sequence_length)

        num_channels_latents = transformer.config.in_visual_dim
        lh = height // self.vae_scale_factor_spatial
        lw = width // self.vae_scale_factor_spatial
        if latents is None:
            key, lat_key = jax.random.split(key)
            latents = randn_tensor((batch_size, 1, lh, lw, num_channels_latents), key=lat_key)

        state = self.scheduler.set_timesteps(num_inference_steps)
        visual_rope, text_rope = transformer.compute_rope(1, lh, lw, (1.0, 1.0, 1.0),
                                                          text_rope_len=embeds_qwen.shape[1])
        neg_text_rope = None
        if do_cfg:
            neg_text_rope = transformer.compute_rope(1, lh, lw, (1.0, 1.0, 1.0),
                                                     text_rope_len=neg_qwen.shape[1])[1]

        denoise = self._jit(
            "denoise",
            partial(self._denoise, guidance_scale=guidance_scale, do_cfg=do_cfg,
                    num_channels_latents=num_channels_latents),
            static=(guidance_scale, do_cfg, num_channels_latents),
        )
        latents = denoise(t_params, latents, embeds_qwen, embeds_clip, neg_qwen, neg_clip,
                          visual_rope, text_rope, neg_text_rope, state.timesteps, state)

        latents = latents[..., :num_channels_latents]
        if output_type == "latent":
            image = latents
        else:
            vae, vae_params = self.vae
            lat = jnp.transpose(latents[:, 0], (0, 3, 1, 2))  # [B, C, H', W']
            lat = lat / vae.config.scaling_factor
            image = vae.decode(vae_params, lat).sample
            image = self.image_processor.postprocess(image, output_type=output_type)

        if not return_dict:
            return (image,)
        return KandinskyImagePipelineOutput(images=image)
