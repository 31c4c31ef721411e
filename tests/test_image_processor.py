"""VaeImageProcessor breadth: resize modes, crop region, overlay merge,
binarize, InpaintProcessor and IPAdapterMaskProcessor (reference
`image_processor.py:82-1434`)."""

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

from diffusers_tpu.image_processor import (
    InpaintProcessor,
    IPAdapterMaskProcessor,
    VaeImageProcessor,
)


def _img(w=64, h=48, color=(255, 0, 0)):
    return Image.new("RGB", (w, h), color)


def test_resize_modes():
    proc = VaeImageProcessor()
    im = _img(64, 48)
    assert proc.resize(im, 32, 32, "default").size == (32, 32)
    assert proc.resize(im, 32, 32, "fill").size == (32, 32)
    assert proc.resize(im, 32, 32, "crop").size == (32, 32)
    with pytest.raises(ValueError):
        proc.resize(im, 32, 32, "stretch-o-matic")
    with pytest.raises(ValueError):
        proc.resize(np.zeros((1, 8, 8, 3)), 4, 4, "fill")
    # numpy default resize works
    out = proc.resize(np.zeros((1, 8, 8, 3), np.float32), 4, 4)
    assert out.shape == (1, 4, 4, 3)


def test_get_crop_region_expands_to_aspect():
    proc = VaeImageProcessor()
    mask = Image.new("L", (100, 100), 0)
    mask.paste(255, (40, 40, 60, 50))  # wide region
    x1, y1, x2, y2 = proc.get_crop_region(mask, 100, 100)
    assert (x2 - x1) == (y2 - y1)  # square processing aspect
    assert x1 <= 40 and x2 >= 60 and y1 <= 40 and y2 >= 50


def test_binarize_and_blur():
    proc = VaeImageProcessor()
    grad = Image.fromarray(np.tile(np.arange(256, dtype=np.uint8), (16, 1)), mode="L")
    binary = np.asarray(proc.binarize(grad))
    assert set(np.unique(binary)) <= {0, 255}
    blurred = proc.blur(_img(), blur_factor=4)
    assert blurred.size == _img().size


def test_apply_overlay_preserves_outside_mask():
    proc = VaeImageProcessor()
    init = _img(32, 32, (0, 255, 0))
    gen = _img(32, 32, (255, 0, 0))
    mask = Image.new("L", (32, 32), 0)
    mask.paste(255, (8, 8, 24, 24))
    out = np.asarray(proc.apply_overlay(mask, init, gen))
    assert tuple(out[0, 0]) == (0, 255, 0)  # outside mask: original
    assert tuple(out[16, 16]) == (255, 0, 0)  # inside mask: generated


def test_inpaint_processor_roundtrip():
    proc = InpaintProcessor(vae_scale_factor=8)
    image = _img(64, 64, (0, 0, 255))
    mask = Image.new("L", (64, 64), 0)
    mask.paste(255, (16, 16, 48, 48))
    img_t, mask_t = proc.preprocess(image, mask)
    assert img_t.shape == (1, 3, 64, 64) and img_t.min() >= -1 and img_t.max() <= 1
    assert mask_t.shape == (1, 1, 64, 64) and set(np.unique(mask_t)) <= {0.0, 1.0}

    generated = np.zeros((1, 3, 64, 64), np.float32)  # gray output
    merged = proc.postprocess(generated, original_image=image, original_mask=mask)[0]
    arr = np.asarray(merged)
    assert tuple(arr[0, 0]) == (0, 0, 255)  # untouched outside the mask


def test_inpaint_processor_padding_mask_crop():
    proc = InpaintProcessor(vae_scale_factor=8)
    image = _img(64, 64)
    mask = Image.new("L", (64, 64), 0)
    mask.paste(255, (24, 24, 40, 40))
    img_t, mask_t, crop = proc.preprocess(image, mask, height=64, width=64, padding_mask_crop=4)
    x1, y1, x2, y2 = crop
    assert x1 <= 20 and x2 >= 44


def test_ip_adapter_mask_downsample():
    proc = IPAdapterMaskProcessor()
    mask = Image.new("L", (64, 64), 0)
    mask.paste(255, (0, 0, 32, 64))  # left half
    m = proc.preprocess(mask)
    assert m.shape == (1, 1, 64, 64)
    down = proc.downsample(m, batch_size=2, num_queries=256, value_embed_dim=8)
    assert down.shape == (2, 256, 8)
    assert 0.4 < down.mean() < 0.6  # half the queries masked on
