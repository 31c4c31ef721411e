"""Marigold image pre/post-processing.

Behavioral mirror of the reference
`pipelines/marigold/marigold_image_processing.py` (resize_antialias `:92`,
resize_to_max_edge `:108`, pad_image `:129` (replicate padding to a
vae_scale_factor multiple), unpad_image `:145`, preprocess `:216`
([0,1]→[-1,1] + longest-edge resize), visualize helpers). Arrays are
numpy/jax NCHW like the reference's torch tensors.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import ConfigMixin, register_to_config


class MarigoldImageProcessor(ConfigMixin):
    config_name = "preprocessor_config.json"

    @register_to_config
    def __init__(self, vae_scale_factor: int = 8, do_normalize: bool = True, do_range_check: bool = True):
        super().__init__()

    @staticmethod
    def resize_antialias(image: jax.Array, size: Tuple[int, int], mode: str, is_aa: Optional[bool] = None):
        antialias = bool(is_aa) and mode in ("bilinear", "bicubic")
        method = {"nearest": "nearest", "nearest-exact": "nearest", "bilinear": "linear",
                  "bicubic": "cubic", "area": "linear"}[mode]
        return jax.image.resize(
            image, (*image.shape[:2], *size), method=method, antialias=antialias
        ).astype(image.dtype)

    @staticmethod
    def resize_to_max_edge(image: jax.Array, max_edge_sz: int, mode: str) -> jax.Array:
        h, w = image.shape[-2:]
        max_orig = max(h, w)
        new_h = h * max_edge_sz // max_orig
        new_w = w * max_edge_sz // max_orig
        if new_h == 0 or new_w == 0:
            raise ValueError(f"Extreme aspect ratio of the input image: [{w} x {h}]")
        return MarigoldImageProcessor.resize_antialias(image, (new_h, new_w), mode, is_aa=True)

    @staticmethod
    def pad_image(image: jax.Array, align: int):
        h, w = image.shape[-2:]
        ph, pw = -h % align, -w % align
        image = jnp.pad(image, ((0, 0), (0, 0), (0, ph), (0, pw)), mode="edge")
        return image, (ph, pw)

    @staticmethod
    def unpad_image(image: jax.Array, padding: Tuple[int, int]) -> jax.Array:
        ph, pw = padding
        uh = None if ph == 0 else -ph
        uw = None if pw == 0 else -pw
        return image[:, :, :uh, :uw]

    @staticmethod
    def load_image_canonical(image) -> jax.Array:
        """Accepts [H,W], [H,W,3], [3,H,W], [N,3,H,W] numpy/jax arrays or PIL
        images; returns float [N,3,H,W] scaled to [0,1] for integer inputs."""
        if hasattr(image, "convert"):  # PIL
            image = np.asarray(image.convert("RGB"))
        image = jnp.asarray(image)
        if image.ndim == 2:
            image = image[None, None].repeat(3, axis=1)
        elif image.ndim == 3:
            if image.shape[-1] in (1, 3):  # HWC
                image = jnp.transpose(image, (2, 0, 1))
            if image.shape[0] == 1:
                image = image.repeat(3, axis=0)
            image = image[None]
        if jnp.issubdtype(image.dtype, jnp.integer):
            image = image.astype(jnp.float32) / 255.0
        return image.astype(jnp.float32)

    def preprocess(self, image, processing_resolution: Optional[int] = None,
                   resample_method_input: str = "bilinear"):
        if isinstance(image, list):
            image = jnp.concatenate([self.load_image_canonical(img) for img in image], axis=0)
        else:
            image = self.load_image_canonical(image)
        original_resolution = image.shape[2:]
        if self.config.do_range_check:
            if float(jnp.min(image)) < 0.0 or float(jnp.max(image)) > 1.0:
                raise ValueError("Input image data is partially outside of the [0,1] range.")
        if self.config.do_normalize:
            image = image * 2.0 - 1.0
        if processing_resolution is not None and processing_resolution > 0:
            image = self.resize_to_max_edge(image, processing_resolution, resample_method_input)
        image, padding = self.pad_image(image, self.config.vae_scale_factor)
        return image, padding, original_resolution

    @staticmethod
    def pt_to_numpy(images: jax.Array) -> np.ndarray:
        return np.asarray(jnp.transpose(images, (0, 2, 3, 1)).astype(jnp.float32))

    @staticmethod
    def visualize_depth(depth, val_min: float = 0.0, val_max: float = 1.0):
        """Simple grayscale visualization (uint8 [H,W] arrays); the reference
        additionally offers a Spectral colormap."""
        out = []
        arrs = depth if isinstance(depth, (list, tuple)) else [depth]
        for d in arrs:
            d = np.asarray(d).squeeze()
            d = (d - val_min) / max(val_max - val_min, 1e-6)
            out.append((np.clip(d, 0, 1) * 255).astype(np.uint8))
        return out
