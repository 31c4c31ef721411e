"""Image pre/post-processing.

Functional mirror of the reference `VaeImageProcessor`
(`/root/reference/src/diffusers/image_processor.py:82`): PIL↔numpy↔jax
conversion, resize, normalize, postprocess. numpy/PIL ops run on host; only
normalize/denormalize touch device arrays.
"""

from __future__ import annotations

import math
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .configuration_utils import ConfigMixin, register_to_config


def numpy_to_pil(images: np.ndarray):
    """[B, H, W, C] float array in [0,1] (or uint8) → list of PIL images."""
    from PIL import Image

    if images.ndim == 3:
        images = images[None, ...]
    if images.dtype != np.uint8:
        images = (images * 255).round().astype("uint8")
    if images.shape[-1] == 1:
        return [Image.fromarray(image.squeeze(), mode="L") for image in images]
    return [Image.fromarray(image) for image in images]


@jax.jit
def _postprocess_pil_device(image):
    """Denormalize + NHWC + uint8 quantization ON DEVICE: the host transfer
    shrinks 4x (uint8 vs f32), which dominates postprocess wall time through
    the device tunnel."""
    x = jnp.clip(image.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
    x = jnp.transpose(x, (0, 2, 3, 1))
    return jnp.round(x * 255.0).astype(jnp.uint8)


@jax.jit
def _postprocess_np_device(image):
    x = jnp.clip(image.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
    return jnp.transpose(x, (0, 2, 3, 1))


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

    # ----------------------------------------------------------- PIL utils
    @staticmethod
    def convert_to_rgb(image):
        return image.convert("RGB")

    @staticmethod
    def convert_to_grayscale(image):
        return image.convert("L")

    @staticmethod
    def blur(image, blur_factor: int = 4):
        """Gaussian-blur a PIL image (reference `image_processor.py:271`)."""
        from PIL import ImageFilter

        return image.filter(ImageFilter.GaussianBlur(blur_factor))

    @staticmethod
    def get_crop_region(mask_image, width: int, height: int, pad: int = 0):
        """Bounding rectangle of the mask's nonzero region, expanded to the
        processing aspect ratio (reference `image_processor.py:288` — the
        webui-style 'inpaint only masked' crop)."""
        mask = np.asarray(mask_image.convert("L"))
        h, w = mask.shape
        ys, xs = np.nonzero(mask)
        if len(xs) == 0:
            return 0, 0, w, h
        x1 = max(int(xs.min()) - pad, 0)
        x2 = min(int(xs.max()) + 1 + pad, w)
        y1 = max(int(ys.min()) - pad, 0)
        y2 = min(int(ys.max()) + 1 + pad, h)

        # expand to the target aspect ratio around the mask region
        ratio_crop = (x2 - x1) / (y2 - y1)
        ratio_proc = width / height
        if ratio_crop > ratio_proc:
            desired_height = int((x2 - x1) / ratio_proc)
            diff = desired_height - (y2 - y1)
            y1 -= diff // 2
            y2 += diff - diff // 2
            if y2 > h:
                y1 -= y2 - h
                y2 = h
            if y1 < 0:
                y2 -= y1
                y1 = 0
            y2 = min(y2, h)
        else:
            desired_width = int((y2 - y1) * ratio_proc)
            diff = desired_width - (x2 - x1)
            x1 -= diff // 2
            x2 += diff - diff // 2
            if x2 > w:
                x1 -= x2 - w
                x2 = w
            if x1 < 0:
                x2 -= x1
                x1 = 0
            x2 = min(x2, w)
        return x1, y1, x2, y2

    def _resample(self):
        from PIL import Image

        return {
            "lanczos": Image.LANCZOS,
            "bilinear": Image.BILINEAR,
            "bicubic": Image.BICUBIC,
            "nearest": Image.NEAREST,
        }[self.config.resample]

    def _resize_and_fill(self, image, width: int, height: int):
        """Fit within the target, filling the borders by edge replication
        (reference `_resize_and_fill`, image_processor.py:377)."""
        from PIL import Image

        ratio = width / height
        src_ratio = image.width / image.height
        src_w = width if ratio < src_ratio else image.width * height // image.height
        src_h = height if ratio >= src_ratio else image.height * width // image.width
        resized = image.resize((src_w, src_h), resample=self._resample())
        res = Image.new("RGB", (width, height))
        res.paste(resized, box=((width - src_w) // 2, (height - src_h) // 2))
        if ratio < src_ratio:
            fill_height = height // 2 - src_h // 2
            if fill_height > 0:
                res.paste(resized.resize((width, fill_height), box=(0, 0, width, 0)), box=(0, 0))
                res.paste(
                    resized.resize((width, fill_height), box=(0, resized.height, width, resized.height)),
                    box=(0, fill_height + src_h),
                )
        elif ratio > src_ratio:
            fill_width = width // 2 - src_w // 2
            if fill_width > 0:
                res.paste(resized.resize((fill_width, height), box=(0, 0, 0, height)), box=(0, 0))
                res.paste(
                    resized.resize((fill_width, height), box=(resized.width, 0, resized.width, height)),
                    box=(fill_width + src_w, 0),
                )
        return res

    def _resize_and_crop(self, image, width: int, height: int):
        """Fill the target, cropping the excess (reference `_resize_and_crop`,
        image_processor.py:429)."""
        ratio = width / height
        src_ratio = image.width / image.height
        src_w = width if ratio > src_ratio else image.width * height // image.height
        src_h = height if ratio <= src_ratio else image.height * width // image.width
        resized = image.resize((src_w, src_h), resample=self._resample())
        left = (src_w - width) // 2
        top = (src_h - height) // 2
        return resized.crop((left, top, left + width, top + height))

    def resize(self, image, height: int, width: int, resize_mode: str = "default"):
        """Resize PIL / numpy HWC-batch inputs; modes "default" (stretch),
        "fill", "crop" are PIL-only like the reference (image_processor.py:462)."""
        from PIL import Image

        if isinstance(image, Image.Image):
            if resize_mode == "default":
                return image.resize((width, height), resample=self._resample())
            if resize_mode == "fill":
                return self._resize_and_fill(image, width, height)
            if resize_mode == "crop":
                return self._resize_and_crop(image, width, height)
            raise ValueError(f"resize_mode {resize_mode} is not supported")
        if resize_mode != "default":
            raise ValueError(f"Only PIL image input is supported for resize_mode {resize_mode}")
        # numpy [B, H, W, C]: nearest resize via index maps (host-side)
        arr = np.asarray(image)
        b, h, w, c = arr.shape
        yi = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
        xi = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
        return arr[:, yi][:, :, xi]

    def binarize(self, image):
        """PIL mask → {0, 255} (reference image_processor.py:523)."""
        from PIL import Image

        arr = np.asarray(image.convert("L"), dtype=np.float32) / 255.0
        return Image.fromarray(((arr >= 0.5) * 255).astype(np.uint8), mode="L")

    def apply_overlay(self, mask, init_image, image, crop_coords=None):
        """Composite the generated region over the original image through the
        mask (reference `apply_overlay`, image_processor.py:788): outside the
        mask the original pixels survive exactly."""
        w, h = init_image.width, init_image.height
        init = np.asarray(init_image.convert("RGB"), dtype=np.float32)
        m = np.asarray(self.resize(mask, h, w).convert("L"), dtype=np.float32)[..., None] / 255.0
        if crop_coords is not None:
            x1, y1, x2, y2 = crop_coords
            gen = np.asarray(
                self.resize(image, y2 - y1, x2 - x1, resize_mode="crop").convert("RGB"), dtype=np.float32
            )
            out = init.copy()
            region_mask = m[y1:y2, x1:x2]
            out[y1:y2, x1:x2] = init[y1:y2, x1:x2] * (1 - region_mask) + gen * region_mask
        else:
            gen = np.asarray(self.resize(image, h, w, resize_mode="crop").convert("RGB"), dtype=np.float32)
            out = init * (1 - m) + gen * m
        return numpy_to_pil(out[None] / 255.0)[0]

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
            # numpy arrays follow the reference convention: channels-last
            # (image_processor.py:82 preprocess) — transpose to NCHW unless
            # the input is already channels-first
            if image.shape[-1] in (1, 3, 4) and image.shape[1] not in (1, 3, 4):
                image = image.transpose(0, 3, 1, 2)
        if self.config.do_normalize and image.min() >= 0:
            image = self.normalize(image)
        return image.astype(np.float32)

    def postprocess(self, image, output_type: str = "pil"):
        """NCHW device array in [-1,1] → requested output. Device arrays are
        denormalized/quantized on device before the (slow) host transfer."""
        if isinstance(image, jax.Array):
            if output_type == "pil":
                return numpy_to_pil(np.asarray(_postprocess_pil_device(image)))
            if output_type == "jax":
                return _postprocess_np_device(image)
            image = _postprocess_np_device(image)
            return np.asarray(image)
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

    # ------------------------------------------------------- PixArt binning
    @staticmethod
    def classify_height_width_bin(height: int, width: int, ratios: dict):
        """Closest aspect-ratio bin (reference image_processor.py:1416)."""
        ar = float(height / width)
        closest = min(ratios.keys(), key=lambda r: abs(float(r) - ar))
        h, w = ratios[closest]
        return int(h), int(w)

    @staticmethod
    def resize_and_crop_tensor(samples, new_width: int, new_height: int):
        """Resize (cover) then center-crop NCHW images (reference
        image_processor.py:1434)."""
        import jax
        import jax.numpy as jnp

        orig_height, orig_width = samples.shape[2], samples.shape[3]
        if orig_height != new_height or orig_width != new_width:
            ratio = max(new_height / orig_height, new_width / orig_width)
            rw, rh = int(orig_width * ratio), int(orig_height * ratio)
            samples = jax.image.resize(
                jnp.asarray(samples), (samples.shape[0], samples.shape[1], rh, rw), method="bilinear"
            )
            start_x = (rw - new_width) // 2
            start_y = (rh - new_height) // 2
            samples = samples[:, :, start_y : start_y + new_height, start_x : start_x + new_width]
        return samples

class VaeImageProcessorLDM3D(VaeImageProcessor):
    """RGB+depth postprocessing for LDM3D's 6-channel VAE output (reference
    image_processor.py VaeImageProcessorLDM3D): channels [0:3] are RGB,
    [3:6] an RGB-like packed 16-bit depth map (G*256 + B)."""

    @staticmethod
    def rgblike_to_depthmap(image: np.ndarray) -> np.ndarray:
        """[H, W, 3] uint8 RGB-like depth → [H, W] uint16 depth map."""
        img = image.astype(np.int64)
        return (img[:, :, 1] * 256 + img[:, :, 2]).astype(np.uint16)

    def numpy_to_depth(self, images: np.ndarray):
        from PIL import Image

        if images.ndim == 3:
            images = images[None, ...]
        depth = images[:, :, :, 3:]
        if images.shape[-1] == 6:
            depth = (depth * 255).round().astype("uint8")
            return [Image.fromarray(self.rgblike_to_depthmap(d), mode="I;16") for d in depth]
        if images.shape[-1] == 4:
            depth = (depth[..., 0] * 65535.0).astype(np.uint16)
            return [Image.fromarray(d, mode="I;16") for d in depth]
        raise ValueError(f"unsupported depth channel count {images.shape[-1]}")

    def postprocess(self, image, output_type: str = "pil"):
        """NCHW [-1,1] 6-channel → (rgb, depth)."""
        image = np.asarray(image)
        image = np.clip(image / 2 + 0.5, 0, 1).transpose(0, 2, 3, 1)
        rgb, depth = image[..., :3], image[..., 3:]
        if output_type in ("np", "latent"):
            return rgb, depth
        if output_type == "pil":
            return numpy_to_pil(rgb), self.numpy_to_depth(image)
        raise ValueError(f"unsupported output_type {output_type}")


class InpaintProcessor(ConfigMixin):
    """Paired image+mask preprocessing and overlay-merging postprocess for
    inpaint pipelines (reference `image_processor.py:836` InpaintProcessor)."""

    config_name = "config.json"

    @register_to_config
    def __init__(self, do_resize: bool = True, vae_scale_factor: int = 8, resample: str = "lanczos",
                 do_normalize: bool = True, mask_do_normalize: bool = False, mask_do_binarize: bool = True):
        self._image_processor = VaeImageProcessor(
            do_resize=do_resize, vae_scale_factor=vae_scale_factor, resample=resample, do_normalize=do_normalize
        )

    def preprocess(self, image, mask, height=None, width=None, padding_mask_crop=None):
        """→ (image NCHW in [-1,1], mask NCHW in {0,1}[, crop_coords])."""
        proc = self._image_processor
        crop_coords = None
        if padding_mask_crop is not None:
            crop_coords = proc.get_crop_region(mask, width or image.width, height or image.height,
                                               pad=padding_mask_crop)
            image = image.crop(crop_coords)
            mask = mask.crop(crop_coords)
        height, width = proc.get_default_height_width(image, height, width)
        image_t = proc.preprocess(image, height, width)
        mask = proc.binarize(proc.resize(mask.convert("L"), height, width))
        mask_t = (np.asarray(mask, dtype=np.float32) / 255.0)[None, None]
        if crop_coords is not None:
            return image_t, mask_t, crop_coords
        return image_t, mask_t

    def postprocess(self, image, original_image=None, original_mask=None, crop_coords=None):
        """Overlay the generated result over the untouched original through
        the mask (exact passthrough outside the mask)."""
        pil_images = self._image_processor.postprocess(image, output_type="pil")
        if original_image is None or original_mask is None:
            return pil_images
        return [
            self._image_processor.apply_overlay(original_mask, original_image, im, crop_coords)
            for im in pil_images
        ]


class IPAdapterMaskProcessor(VaeImageProcessor):
    """Mask preprocessing for IP-Adapter attention masking (reference
    `image_processor.py:1270`): grayscale {0,1} masks + downsampling to the
    attention sequence length."""

    @register_to_config
    def __init__(self, do_resize: bool = True, vae_scale_factor: int = 8, resample: str = "lanczos",
                 do_normalize: bool = False, do_binarize: bool = True, do_convert_grayscale: bool = True):
        pass

    def preprocess(self, image, height=None, width=None):
        from PIL import Image

        if isinstance(image, Image.Image):
            image = [image]
        if isinstance(image, list) and isinstance(image[0], Image.Image):
            arrs = []
            for im in image:
                im = im.convert("L")
                if height is not None and width is not None:
                    im = im.resize((width, height), resample=Image.LANCZOS)
                arrs.append(np.asarray(im, dtype=np.float32) / 255.0)
            out = np.stack(arrs)[:, None]  # [B, 1, H, W]
        else:
            out = np.asarray(image, dtype=np.float32)
            if out.ndim == 3:
                out = out[:, None]
        return (out >= 0.5).astype(np.float32)

    @staticmethod
    def downsample(mask: np.ndarray, batch_size: int, num_queries: int, value_embed_dim: int):
        """[B,1,H,W] mask → [B*batch, num_queries, value_embed_dim]-broadcastable
        attention mask (reference `IPAdapterMaskProcessor.downsample`)."""
        o_h, o_w = mask.shape[-2:]
        ratio = o_w / o_h
        mask_h = int(math.sqrt(num_queries / ratio))
        mask_h = int(mask_h) + int((num_queries % int(mask_h)) != 0)
        mask_w = num_queries // mask_h

        yi = (np.arange(mask_h) * (o_h / mask_h)).astype(np.int64).clip(0, o_h - 1)
        xi = (np.arange(mask_w) * (o_w / mask_w)).astype(np.int64).clip(0, o_w - 1)
        small = mask[:, 0][:, yi][:, :, xi].reshape(mask.shape[0], -1)  # [B, h*w]
        if small.shape[1] < num_queries:
            small = np.pad(small, ((0, 0), (0, num_queries - small.shape[1])))
        small = small[:, :num_queries]
        if mask.shape[0] < batch_size:
            small = np.repeat(small, batch_size // mask.shape[0], axis=0)
        return np.repeat(small[:, :, None], value_embed_dim, axis=2)

