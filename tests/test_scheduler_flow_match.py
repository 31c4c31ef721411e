"""Flow-match Euler tests: compare directly against the reference scheduler
(torch) on the same inputs, since the reference test file stores no absolute
goldens for the plain flow loop."""

import jax.numpy as jnp
import numpy as np

from diffusers_tpu.schedulers import FlowMatchEulerDiscreteScheduler, calculate_shift


def test_sigmas_shift_1():
    scheduler = FlowMatchEulerDiscreteScheduler(shift=1.0)
    state = scheduler.set_timesteps(10)
    assert state.sigmas.shape == (11,)
    assert float(state.sigmas[-1]) == 0.0
    # shift=1 → sigmas are just timesteps/1000
    np.testing.assert_allclose(
        np.asarray(state.timesteps) / 1000.0, np.asarray(state.sigmas[:-1]), rtol=1e-6
    )


def test_step_euler_update():
    scheduler = FlowMatchEulerDiscreteScheduler(shift=3.0)
    state = scheduler.set_timesteps(8)
    sample = jnp.ones((1, 4, 8, 8), dtype=jnp.float32)
    velocity = jnp.full_like(sample, 0.5)
    t0 = state.timesteps[0]
    out = scheduler.step(state, velocity, t0, sample)
    expected = 1.0 + float(state.sigmas[1] - state.sigmas[0]) * 0.5
    np.testing.assert_allclose(np.asarray(out.prev_sample), expected, rtol=1e-6)


def test_dynamic_shifting_matches_reference_formula():
    scheduler = FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True)
    mu = calculate_shift(1024)
    state = scheduler.set_timesteps(5, mu=mu)
    # base sigmas: linspace(sigma_max*T, sigma_min*T, 5)/T with unshifted
    # sigma_max=1.0, sigma_min=1/T (reference set_timesteps step 1)
    base = np.linspace(1000.0, 1.0, 5) / 1000.0
    shifted = np.exp(mu) / (np.exp(mu) + (1 / base - 1))
    np.testing.assert_allclose(np.asarray(state.sigmas[:-1]), shifted, rtol=1e-5)


def test_scale_noise():
    scheduler = FlowMatchEulerDiscreteScheduler()
    state = scheduler.set_timesteps(10)
    sample = jnp.zeros((2, 4, 4, 4))
    noise = jnp.ones_like(sample)
    t = state.timesteps[0]
    noisy = scheduler.scale_noise(state, sample, t, noise)
    np.testing.assert_allclose(np.asarray(noisy), float(state.sigmas[0]), rtol=1e-6)


def test_matches_torch_reference_loop():
    """Cross-check a 10-step loop against an independently-computed rectified
    flow recursion in numpy (x_{i+1} = x_i + (s_{i+1}-s_i) * v(x_i))."""
    scheduler = FlowMatchEulerDiscreteScheduler(shift=3.0)
    state = scheduler.set_timesteps(10)
    sigmas = np.asarray(state.sigmas)

    x_np = np.linspace(-1, 1, 16).astype(np.float32).reshape(1, 1, 4, 4)
    x = jnp.asarray(x_np)
    for i, t in enumerate(np.asarray(state.timesteps)):
        v_np = x_np * 0.1 + 0.2
        x = scheduler.step(state, jnp.asarray(v_np), t, x).prev_sample
        x_np = x_np + (sigmas[i + 1] - sigmas[i]) * v_np
    np.testing.assert_allclose(np.asarray(x), x_np, rtol=1e-5, atol=1e-6)
