"""LTXConditionPipeline: multi-conditioning denoise with per-token timesteps.

Reference: `/root/reference/src/diffusers/pipelines/ltx/pipeline_ltx_condition.py:148`
(condition injection, extra token streams, per-token Euler step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.schedulers import FlowMatchEulerDiscreteScheduler


def _pipe():
    from diffusers_tpu import LTXConditionPipeline
    from test_pipeline_ltx import get_dummy_pipeline

    base = get_dummy_pipeline()
    comps = dict(base.components)
    # condition checkpoints ship a non-dynamic-shift scheduler
    comps["scheduler"] = FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=False, shift=1.0)
    return LTXConditionPipeline(**comps)


def test_ltx_condition_image_frame0():
    from diffusers_tpu import LTXVideoCondition

    pipe = _pipe()
    img = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    cond = LTXVideoCondition(image=jnp.asarray(img), frame_index=0, strength=1.0)
    out = pipe(conditions=cond, prompt="a river", height=32, width=32, num_frames=9,
               num_inference_steps=3, guidance_scale=3.0, image_cond_noise_scale=0.15,
               key=jax.random.PRNGKey(0), output_type="np").frames
    assert out.ndim == 5 and out.shape[-1] == 3
    assert np.isfinite(out).all()

    # conditioning must change the output vs unconditioned run with same key
    free = pipe(prompt="a river", height=32, width=32, num_frames=9,
                num_inference_steps=3, guidance_scale=3.0,
                key=jax.random.PRNGKey(0), output_type="np").frames
    assert np.abs(out - free).max() > 1e-6


def test_ltx_condition_video_nonzero_frame_index():
    from diffusers_tpu import LTXVideoCondition

    pipe = _pipe()
    rt = pipe.vae_temporal_compression_ratio
    rng = np.random.RandomState(0)
    # k*ratio+1 pixel frames → k+1 latent frames (>2 so the mid-lerp engages)
    vid = rng.rand(1, 3, 3 * rt + 1, 32, 32).astype(np.float32) * 2 - 1
    cond = LTXVideoCondition(video=jnp.asarray(vid), frame_index=rt, strength=0.8)
    num_frames = 8 * rt + 1
    out = pipe(conditions=cond, prompt="a storm", height=32, width=32, num_frames=num_frames,
               num_inference_steps=3, guidance_scale=1.0,  # no CFG branch
               key=jax.random.PRNGKey(0), output_type="latent").frames
    # extra conditioning tokens must be trimmed from the output
    assert out.shape[1] == 8  # latent channels
    assert out.shape[2] == (num_frames - 1) // rt + 1
    assert np.isfinite(np.asarray(out)).all()


def test_per_token_step_matches_scalar_step():
    """The per-token Euler branch with uniform timesteps must equal the scalar
    branch — guards the sign convention (r4 advisor: the condition pipeline
    passed -noise_pred, inverting the update vs scheduling_flow_match_euler_
    discrete.py:205 which uses +(sigma_next - sigma)*v in BOTH branches)."""
    sched = FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=False, shift=1.0)
    state = sched.set_timesteps(num_inference_steps=4)
    rng = np.random.RandomState(0)
    sample = jnp.asarray(rng.randn(1, 6, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 6, 8).astype(np.float32))
    t = state.timesteps[1]
    scalar = sched.step(state, v, t, sample).prev_sample
    tt = jnp.full((1, 6), t, jnp.float32)
    per_tok = sched.step(state, v, t, sample, per_token_timesteps=tt).prev_sample
    np.testing.assert_allclose(np.asarray(per_tok), np.asarray(scalar), atol=1e-5)


def test_condition_denoise_matches_uncond_path_with_zero_mask():
    """has_cond branch with an all-zero conditioning mask (no token pinned)
    must reproduce the conditioning_mask=None branch step-for-step — catches
    any sign/timestep divergence between the two code paths."""
    pipe = _pipe()
    transformer, t_params = pipe.transformer
    sched = pipe.scheduler
    state = sched.set_timesteps(num_inference_steps=3)
    rng = np.random.RandomState(0)
    rt, rs = pipe.vae_temporal_compression_ratio, pipe.vae_spatial_compression_ratio
    f, h, w = (9 - 1) // rt + 1, 32 // rs, 32 // rs
    seq = f * h * w
    latents = jnp.asarray(rng.randn(1, seq, transformer.config.in_channels).astype(np.float32))
    embeds = jnp.asarray(rng.randn(1, 16, transformer.config.caption_channels).astype(np.float32))
    mask = jnp.ones((1, 16), jnp.bool_)
    coords = jnp.stack(jnp.meshgrid(jnp.arange(f), jnp.arange(h), jnp.arange(w), indexing="ij"), axis=0)
    coords = coords.reshape(3, -1)[None].astype(jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    kwargs = dict(embeds=embeds, mask=mask, video_coords=coords,
                  timesteps=state.timesteps, noise_keys=keys, state=state,
                  guidance_scale=1.0, do_cfg=False, image_cond_noise_scale=0.0)
    base = pipe._denoise_condition(t_params, latents, latents, None, **kwargs)
    cond = pipe._denoise_condition(t_params, latents, latents,
                                   jnp.zeros((1, seq), jnp.float32), **kwargs)
    np.testing.assert_allclose(np.asarray(cond), np.asarray(base), atol=1e-4)


def test_ltx_condition_latents_denoise_strength():
    pipe = _pipe()
    rt, rs = pipe.vae_temporal_compression_ratio, pipe.vae_spatial_compression_ratio
    shape = (1, 8, (9 - 1) // rt + 1, 32 // rs, 32 // rs)
    latents = jnp.asarray(np.random.RandomState(0).randn(*shape).astype(np.float32))
    out = pipe(prompt="a river", height=32, width=32, num_frames=9,
               latents=latents, denoise_strength=0.5, num_inference_steps=4,
               guidance_scale=3.0, key=jax.random.PRNGKey(0), output_type="latent").frames
    assert np.asarray(out).shape == shape
    assert np.isfinite(np.asarray(out)).all()
