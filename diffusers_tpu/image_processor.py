"""Image pre/post-processing.

Functional mirror of the reference `VaeImageProcessor`
(`/root/reference/src/diffusers/image_processor.py:82`): PIL↔numpy↔jax
conversion, resize, normalize, postprocess. numpy/PIL ops run on host; only
normalize/denormalize touch device arrays.
"""

from __future__ import annotations

import math
from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np

from .configuration_utils import ConfigMixin, register_to_config


def numpy_to_pil(images: np.ndarray):
    """[B, H, W, C] float array in [0,1] → list of PIL images."""
    from PIL import Image

    if images.ndim == 3:
        images = images[None, ...]
    images = (images * 255).round().astype("uint8")
    if images.shape[-1] == 1:
        return [Image.fromarray(image.squeeze(), mode="L") for image in images]
    return [Image.fromarray(image) for image in images]


def pil_to_numpy(images) -> np.ndarray:
    from PIL import Image

    if isinstance(images, Image.Image):
        images = [images]
    arrs = [np.array(im.convert("RGB")).astype(np.float32) / 255.0 for im in images]
    return np.stack(arrs, axis=0)


class VaeImageProcessor(ConfigMixin):
    config_name = "config.json"

    @register_to_config
    def __init__(
        self,
        do_resize: bool = True,
        vae_scale_factor: int = 8,
        vae_latent_channels: int = 4,
        resample: str = "lanczos",
        do_normalize: bool = True,
        do_binarize: bool = False,
        do_convert_rgb: bool = False,
        do_convert_grayscale: bool = False,
    ):
        pass

    @staticmethod
    def normalize(images):
        """[0,1] → [-1,1]."""
        return 2.0 * images - 1.0

    @staticmethod
    def denormalize(images):
        """[-1,1] → [0,1]."""
        return np.clip(images / 2 + 0.5, 0, 1) if isinstance(images, np.ndarray) else jnp.clip(images / 2 + 0.5, 0, 1)

    def get_default_height_width(self, image, height=None, width=None):
        from PIL import Image

        if height is None:
            height = image.height if isinstance(image, Image.Image) else image.shape[-2]
        if width is None:
            width = image.width if isinstance(image, Image.Image) else image.shape[-1]
        sf = self.config.vae_scale_factor
        return height - height % sf, width - width % sf

    def resize(self, image, height: int, width: int):
        from PIL import Image

        if isinstance(image, Image.Image):
            return image.resize((width, height), resample=Image.LANCZOS)
        raise ValueError("resize currently supports PIL inputs")

    def preprocess(self, image, height: Optional[int] = None, width: Optional[int] = None) -> np.ndarray:
        """PIL / numpy HWC / NCHW → normalized NCHW float32 numpy."""
        from PIL import Image

        if isinstance(image, Image.Image):
            image = [image]
        if isinstance(image, list) and isinstance(image[0], Image.Image):
            height, width = self.get_default_height_width(image[0], height, width)
            if self.config.do_resize:
                image = [self.resize(im, height, width) for im in image]
            image = pil_to_numpy(image)  # [B, H, W, C]
            image = image.transpose(0, 3, 1, 2)
        else:
            image = np.asarray(image, dtype=np.float32)
            if image.ndim == 3:
                image = image[None]
        if self.config.do_normalize and image.min() >= 0:
            image = self.normalize(image)
        return image.astype(np.float32)

    def postprocess(self, image, output_type: str = "pil"):
        """NCHW device array in [-1,1] → requested output."""
        image = np.asarray(image)
        image = np.clip(image / 2 + 0.5, 0, 1)
        image = image.transpose(0, 2, 3, 1)
        if output_type == "latent" or output_type == "np":
            return image
        if output_type == "pil":
            return numpy_to_pil(image)
        if output_type == "jax":
            return jnp.asarray(image)
        raise ValueError(f"unsupported output_type {output_type}")
