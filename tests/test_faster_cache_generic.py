"""FasterCache generalized beyond SDXL (VERDICT r4 #6): the CFG-cache loop
(`hooks/faster_cache.py denoise_scan_faster_cache`) wired into SD3 / Wan /
LTX, verified by cached-vs-dense cosine on tiny pipelines.
"""

import jax
import numpy as np
import pytest

from diffusers_tpu.hooks.faster_cache import FasterCacheConfig

CFG = FasterCacheConfig(unconditional_batch_skip_range=2,
                        unconditional_batch_timestep_skip_range=(-1, 1000))


def _cos(a, b):
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def _run(pipe, attr, **kw):
    dense = np.asarray(getattr(pipe("a cat", **kw), attr))
    pipe.enable_cache(CFG)
    cached = np.asarray(getattr(pipe("a cat", **kw), attr))
    pipe.disable_cache()
    assert dense.shape == cached.shape
    c = _cos(dense, cached)
    assert c > 0.9, f"faster-cache cosine {c}"
    assert np.isfinite(cached).all()
    return dense, cached


def test_faster_cache_sd3():
    from test_pipelines_img2img_inpaint_sd3 import get_dummy_sd3_pipeline

    pipe = get_dummy_sd3_pipeline()
    _run(pipe, "images", height=8, width=8, num_inference_steps=4, guidance_scale=5.0,
         key=jax.random.PRNGKey(0), output_type="latent")


def test_faster_cache_wan():
    from test_pipeline_wan import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    _run(pipe, "frames", height=16, width=16, num_frames=5, num_inference_steps=4,
         guidance_scale=5.0, key=jax.random.PRNGKey(0), output_type="latent")


def test_faster_cache_ltx():
    from test_pipeline_ltx import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    _run(pipe, "frames", height=32, width=32, num_frames=9, num_inference_steps=4,
         guidance_scale=3.0, key=jax.random.PRNGKey(0), output_type="latent")


def test_faster_cache_skips_change_output_but_not_much():
    """With skip_range=1 every post-first step skips the uncond forward —
    output must still be finite and close-ish (the frequency-delta replay)."""
    from test_pipelines_img2img_inpaint_sd3 import get_dummy_sd3_pipeline

    pipe = get_dummy_sd3_pipeline()
    kw = dict(height=8, width=8, num_inference_steps=6, guidance_scale=5.0,
              key=jax.random.PRNGKey(0), output_type="latent")
    dense = np.asarray(pipe("a cat", **kw).images)
    pipe.enable_cache(FasterCacheConfig(unconditional_batch_skip_range=3,
                                        unconditional_batch_timestep_skip_range=(-1, 1000)))
    cached = np.asarray(pipe("a cat", **kw).images)
    assert np.isfinite(cached).all()
    assert not np.allclose(dense, cached)  # the cache is actually engaged
    assert _cos(dense, cached) > 0.85
