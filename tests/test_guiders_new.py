"""Parity tests for the round-2 guiders vs the torch reference's pure math
(`/root/reference/src/diffusers/guiders/*.py` run in-process), plus
self-consistency for FDG (reference needs kornia, unavailable here)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

from diffusers_tpu.guiders import (
    AdaptiveProjectedMixGuidance,
    AutoGuidance,
    ClassifierFreeGuidance,
    FrequencyDecoupledGuidance,
    MagnitudeAwareGuidance,
    SmoothedEnergyGuidance,
    TangentialClassifierFreeGuidance,
    seg_gaussian_blur_2d,
)


def _pair(shape=(2, 4, 8, 8), seed=0):
    rng = np.random.RandomState(seed)
    cond = rng.randn(*shape).astype(np.float32)
    uncond = rng.randn(*shape).astype(np.float32)
    return cond, uncond


def test_magnitude_aware_matches_reference():
    import torch
    from diffusers.guiders.magnitude_aware_guidance import mambo_guidance as ref_mambo

    # 3D (packed-token) layout: torch.norm over >2 trailing dims is
    # unsupported in this torch version, so compare on [B, S, C]
    cond, uncond = _pair(shape=(2, 16, 8))
    ours = MagnitudeAwareGuidance(guidance_scale=10.0, alpha=8.0)(
        jnp.asarray(cond), jnp.asarray(uncond), step=1, num_steps=10
    )
    ref = ref_mambo(torch.from_numpy(cond), torch.from_numpy(uncond), 10.0, 8.0)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_tcfg_matches_reference():
    import torch
    from diffusers.guiders.tangential_classifier_free_guidance import (
        normalized_guidance as ref_tcfg,
    )

    cond, uncond = _pair(shape=(2, 4, 6, 6), seed=3)
    ours = TangentialClassifierFreeGuidance(guidance_scale=5.0)(
        jnp.asarray(cond), jnp.asarray(uncond), step=1, num_steps=10
    )
    ref = ref_tcfg(torch.from_numpy(cond), torch.from_numpy(uncond), 5.0)
    # SVD sign ambiguity is absorbed by the projection; results must agree
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-3, rtol=1e-3)


def test_auto_guidance_math_is_cfg_with_degraded_uncond():
    cond, degraded = _pair(seed=5)
    g = AutoGuidance(guidance_scale=4.0, auto_guidance_layers=[0])
    ours = g(jnp.asarray(cond), jnp.asarray(degraded), step=1, num_steps=10)
    ref = ClassifierFreeGuidance(guidance_scale=4.0)(jnp.asarray(cond), jnp.asarray(degraded), step=1, num_steps=10)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-6)
    with pytest.raises(ValueError):
        AutoGuidance(guidance_scale=4.0)


def test_apg_mix_phases():
    cond, uncond = _pair(seed=7)
    g = AdaptiveProjectedMixGuidance(
        guidance_scale=5.0,
        adaptive_projected_guidance_scale=5.0,
        adaptive_projected_guidance_start_step=5,
        eta=0.0,
        adaptive_projected_guidance_rescale=0.0,
    )
    m = g.init_momentum(cond.shape)
    early, m1 = g(jnp.asarray(cond), jnp.asarray(uncond), step=0, num_steps=10, momentum=m)
    cfg_ref = ClassifierFreeGuidance(guidance_scale=5.0)(jnp.asarray(cond), jnp.asarray(uncond), step=0, num_steps=10)
    np.testing.assert_allclose(np.asarray(early), np.asarray(cfg_ref), atol=1e-5)
    late, _ = g(jnp.asarray(cond), jnp.asarray(uncond), step=6, num_steps=10, momentum=m1)
    assert np.abs(np.asarray(late) - np.asarray(cfg_ref)).max() > 1e-4  # APG phase differs


def test_fdg_pyramid_roundtrip_and_cfg_limit():
    from diffusers_tpu.guiders.frequency_decoupled_guidance import (
        build_image_from_pyramid,
        build_laplacian_pyramid,
    )

    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 16, 16), jnp.float32)
    pyr = build_laplacian_pyramid(x, 3)
    rec = build_image_from_pyramid(pyr)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-4)

    # equal scales at every level == plain CFG (linearity of the pyramid)
    cond, uncond = _pair(shape=(1, 4, 16, 16), seed=9)
    fdg = FrequencyDecoupledGuidance(guidance_scales=(6.0, 6.0))(
        jnp.asarray(cond), jnp.asarray(uncond), step=1, num_steps=10
    )
    cfg = ClassifierFreeGuidance(guidance_scale=6.0)(jnp.asarray(cond), jnp.asarray(uncond), step=1, num_steps=10)
    np.testing.assert_allclose(np.asarray(fdg), np.asarray(cfg), atol=1e-3)


def test_fdg_distinct_scales_differ_from_cfg():
    cond, uncond = _pair(shape=(1, 4, 16, 16), seed=11)
    fdg = FrequencyDecoupledGuidance(guidance_scales=(10.0, 2.0))(
        jnp.asarray(cond), jnp.asarray(uncond), step=1, num_steps=10
    )
    cfg = ClassifierFreeGuidance(guidance_scale=10.0)(jnp.asarray(cond), jnp.asarray(uncond), step=1, num_steps=10)
    assert np.abs(np.asarray(fdg) - np.asarray(cfg)).max() > 1e-3


def test_seg_blur_inf_sigma_is_mean_and_guider_formula():
    q = jnp.asarray(np.random.RandomState(0).randn(2, 16, 8), jnp.float32)
    blurred = seg_gaussian_blur_2d(q, 3, 1e7)
    np.testing.assert_allclose(
        np.asarray(blurred), np.broadcast_to(np.asarray(q).mean(axis=1, keepdims=True), q.shape), atol=1e-5
    )
    # finite sigma: changes values and reduces variance (smoothing)
    blurred2 = seg_gaussian_blur_2d(q, 3, 1.0)
    assert np.abs(np.asarray(blurred2) - np.asarray(q)).max() > 1e-4
    assert np.asarray(blurred2).var() < np.asarray(q).var()

    cond, uncond = _pair(seed=13)
    seg_pred = np.random.RandomState(14).randn(*cond.shape).astype(np.float32)
    g = SmoothedEnergyGuidance(guidance_scale=5.0, seg_guidance_scale=2.0, seg_guidance_stop=1.0)
    out = g(jnp.asarray(cond), jnp.asarray(uncond), jnp.asarray(seg_pred), step=1, num_steps=10)
    manual = uncond + 5.0 * (cond - uncond) + 2.0 * (cond - seg_pred)
    np.testing.assert_allclose(np.asarray(out), manual, atol=1e-5)


def test_seg_blur_flag_on_attention():
    """seg_blurred context flips the trace-time flag and changes outputs."""
    from diffusers_tpu.guiders import seg_blurred
    from diffusers_tpu.models.attention import Attention

    attn = Attention(query_dim=16, heads=2, dim_head=8)
    params = attn.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16), jnp.float32)  # 16 tokens = 4x4 grid
    clean = attn(params, x)
    with seg_blurred([attn], sigma=2.0):
        blurred = attn(params, x)
    assert attn.seg_blur_sigma is None
    assert np.abs(np.asarray(clean) - np.asarray(blurred)).max() > 1e-5
