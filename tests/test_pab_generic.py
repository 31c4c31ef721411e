"""Pyramid Attention Broadcast generalized to SD3 / Wan / LTX (round 5).

skip_range=1 → every step recomputes → must match the dense scan exactly
(the lax.cond compute branch is the plain attention). skip_range=2 →
broadcast steps reuse cached attention; output must stay finite and close.
"""

import jax
import numpy as np

from diffusers_tpu.hooks.pyramid_attention_broadcast import (
    PyramidAttentionBroadcastConfig,
    pab_compute_mask,
)


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


ALL = PyramidAttentionBroadcastConfig(
    spatial_attention_block_skip_range=1, spatial_attention_timestep_skip_range=(-1, 1001))
SKIP2 = PyramidAttentionBroadcastConfig(
    spatial_attention_block_skip_range=2, spatial_attention_timestep_skip_range=(-1, 1001))


def test_pab_mask_semantics():
    ts = np.array([900.0, 700.0, 500.0, 300.0, 100.0])
    m = pab_compute_mask(ts, 2, (200, 800))
    # step0 always computes; steps outside (200, 800) compute; inside: every 2nd
    assert m.tolist() == [True, False, True, False, True]
    m1 = pab_compute_mask(ts, 1, (-1, 1001))
    assert m1.all()


def test_sd3_pab_skip1_matches_dense_and_skip2_close():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_modular_packs import _get_sd3_pipeline

    pipe = _get_sd3_pipeline()
    kwargs = dict(height=16, width=16, num_inference_steps=4, guidance_scale=5.0,
                  max_sequence_length=16, key=jax.random.PRNGKey(0), output_type="latent")
    dense = np.asarray(pipe("a glass orb", **kwargs).images)
    pipe.enable_cache(ALL)
    exact = np.asarray(pipe("a glass orb", **kwargs).images)
    np.testing.assert_allclose(exact, dense, atol=1e-4)
    pipe.enable_cache(SKIP2)
    cached = np.asarray(pipe("a glass orb", **kwargs).images)
    assert np.isfinite(cached).all()
    assert _cosine(dense, cached) > 0.9
    pipe.disable_cache()


def test_wan_pab_skip1_matches_dense_and_skip2_close():
    from tests.test_pipeline_wan import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    kwargs = dict(height=16, width=16, num_frames=5, num_inference_steps=4,
                  guidance_scale=5.0, key=jax.random.PRNGKey(0), output_type="latent")
    dense = np.asarray(pipe("a robot dancing", **kwargs).frames)
    pipe.enable_cache(ALL)
    exact = np.asarray(pipe("a robot dancing", **kwargs).frames)
    np.testing.assert_allclose(exact, dense, atol=1e-4)
    pipe.enable_cache(SKIP2)
    cached = np.asarray(pipe("a robot dancing", **kwargs).frames)
    assert np.isfinite(cached).all()
    assert _cosine(dense, cached) > 0.9
    pipe.disable_cache()


def test_ltx_pab_skip1_matches_dense_and_skip2_close():
    from tests.test_pipeline_ltx import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    kwargs = dict(height=16, width=16, num_frames=5, num_inference_steps=4,
                  guidance_scale=4.0, key=jax.random.PRNGKey(0), output_type="latent")
    dense = np.asarray(pipe("a paper boat", **kwargs).frames)
    pipe.enable_cache(ALL)
    exact = np.asarray(pipe("a paper boat", **kwargs).frames)
    np.testing.assert_allclose(exact, dense, atol=1e-4)
    pipe.enable_cache(SKIP2)
    cached = np.asarray(pipe("a paper boat", **kwargs).frames)
    assert np.isfinite(cached).all()
    assert _cosine(dense, cached) > 0.9
    pipe.disable_cache()
