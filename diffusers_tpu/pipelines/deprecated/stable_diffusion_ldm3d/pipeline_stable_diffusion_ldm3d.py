"""LDM3D joint RGB + depth text-to-image pipeline.

Behavioral mirror of the reference
(`/root/reference/src/diffusers/pipelines/deprecated/stable_diffusion_ldm3d/pipeline_stable_diffusion_ldm3d.py:95`,
arXiv:2305.10853): a standard SD denoise over a VAE whose decoder emits SIX
channels — RGB plus an RGB-like packed 16-bit depth map — split by
`VaeImageProcessorLDM3D`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Union

import jax
import numpy as np

from ....image_processor import VaeImageProcessorLDM3D
from ....utils import BaseOutput
from ...stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipeline


@dataclass
class LDM3DPipelineOutput(BaseOutput):
    rgb: Union[List, np.ndarray]
    depth: Union[List, np.ndarray]
    nsfw_content_detected: Optional[List[bool]] = None


class StableDiffusionLDM3DPipeline(StableDiffusionPipeline):
    def __init__(self, vae, text_encoder, tokenizer, unet, scheduler,
                 safety_checker=None, feature_extractor=None, image_encoder=None,
                 requires_safety_checker: bool = False):
        super().__init__(
            vae=vae, text_encoder=text_encoder, tokenizer=tokenizer, unet=unet,
            scheduler=scheduler, safety_checker=safety_checker,
            feature_extractor=feature_extractor, image_encoder=image_encoder,
            requires_safety_checker=requires_safety_checker,
        )
        self.image_processor = VaeImageProcessorLDM3D(vae_scale_factor=self.vae_scale_factor)

    def __call__(self, *args, output_type: str = "pil", return_dict: bool = True, **kwargs):
        out = super().__call__(*args, output_type="latent", return_dict=False, **kwargs)
        latents = out[0]
        if output_type == "latent":
            if not return_dict:
                return (latents, None)
            return LDM3DPipelineOutput(rgb=latents, depth=latents)
        vae, vae_params = self.vae
        decode = self._jit("decode", lambda p, z: vae.decode(p, z / vae.config.scaling_factor).sample)
        image = decode(vae_params, latents)  # [B, 6, H, W]
        rgb, depth = self.image_processor.postprocess(image, output_type=output_type)
        if not return_dict:
            return ((rgb, depth), None)
        return LDM3DPipelineOutput(rgb=rgb, depth=depth)
