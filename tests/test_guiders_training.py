"""Guiders + training utilities tests."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusers_tpu.guiders import (
    AdaptiveProjectedGuidance,
    ClassifierFreeGuidance,
    ClassifierFreeZeroStarGuidance,
    rescale_noise_cfg,
)
from diffusers_tpu.training.ema import EMAModel
from diffusers_tpu.training.optimization import get_scheduler


def test_cfg_matches_manual():
    g = ClassifierFreeGuidance(guidance_scale=7.5)
    cond = jnp.ones((2, 4, 8, 8)) * 2.0
    uncond = jnp.ones((2, 4, 8, 8))
    out = g(cond, uncond, step=5, num_steps=10)
    np.testing.assert_allclose(np.asarray(out), 1.0 + 7.5 * 1.0)


def test_cfg_step_gating():
    g = ClassifierFreeGuidance(guidance_scale=7.5, start=0.5, stop=1.0)
    cond = jnp.ones((1, 4)) * 2.0
    uncond = jnp.ones((1, 4))
    early = g(cond, uncond, step=0, num_steps=10)
    late = g(cond, uncond, step=8, num_steps=10)
    np.testing.assert_allclose(np.asarray(early), 2.0)  # disabled -> pred_cond
    np.testing.assert_allclose(np.asarray(late), 8.5)


def test_cfg_zero_star_zero_init():
    g = ClassifierFreeZeroStarGuidance(guidance_scale=3.0, zero_init_steps=1)
    cond = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4))
    uncond = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4))
    out0 = g(cond, uncond, step=0, num_steps=10)
    np.testing.assert_allclose(np.asarray(out0), 0.0)
    out1 = g(cond, uncond, step=1, num_steps=10)
    assert np.abs(np.asarray(out1)).max() > 0


def test_apg_matches_cfg_at_eta_1_and_differs_below():
    # with eta=1 and no norm clipping, the projection sums back to the raw diff
    cond = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8))
    uncond = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8))
    cfg = ClassifierFreeGuidance(guidance_scale=5.0)
    b = cfg(cond, uncond, step=1, num_steps=10)

    g1 = AdaptiveProjectedGuidance(guidance_scale=5.0, eta=1.0, adaptive_projected_guidance_rescale=0.0)
    np.testing.assert_allclose(np.asarray(g1(cond, uncond, step=1, num_steps=10)), np.asarray(b), atol=1e-5)

    # eta < 1 down-weights the parallel component -> differs from CFG
    g2 = AdaptiveProjectedGuidance(guidance_scale=5.0, eta=0.0, adaptive_projected_guidance_rescale=0.0)
    a = g2(cond, uncond, step=1, num_steps=10)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


def test_rescale_noise_cfg():
    cond = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8)) * 0.5
    cfg_pred = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8)) * 2.0
    out = rescale_noise_cfg(cfg_pred, cond, guidance_rescale=1.0)
    np.testing.assert_allclose(
        np.std(np.asarray(out), axis=(1, 2)), np.std(np.asarray(cond), axis=(1, 2)), rtol=1e-4
    )


def test_ema_moves_towards_params():
    ema = EMAModel(decay=0.9)
    params = {"w": jnp.zeros((4,))}
    state = ema.init(params)
    new_params = {"w": jnp.ones((4,))}
    for _ in range(20):
        state = ema.update(state, new_params)
    assert 0.5 < float(state.shadow_params["w"][0]) <= 1.0


def test_lr_schedules():
    for name in ["constant", "constant_with_warmup", "linear", "cosine", "polynomial", "cosine_with_restarts"]:
        sched = get_scheduler(name, learning_rate=1e-3, num_warmup_steps=10, num_training_steps=100)
        v0 = float(sched(0))
        v10 = float(sched(10))
        v99 = float(sched(99))
        assert v10 >= v0
        assert v99 <= v10 + 1e-9
