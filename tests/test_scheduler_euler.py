"""Euler discrete golden tests mirroring reference `tests/schedulers/test_scheduler_euler.py`."""

import jax.numpy as jnp
import numpy as np

from diffusers_tpu.schedulers import EulerDiscreteScheduler
from diffusers_tpu.schedulers.scheduling_utils import index_for_timestep


def dummy_sample_deter():
    batch_size, num_channels, height, width = 4, 3, 8, 8
    num_elems = batch_size * num_channels * height * width
    sample = np.arange(num_elems, dtype=np.float32)
    sample = sample.reshape(num_channels, height, width, batch_size) / num_elems
    return jnp.asarray(np.transpose(sample, (3, 0, 1, 2)))


def dummy_model(sample, t):
    return sample * t / (t + 1)


def full_loop(**config):
    scheduler = EulerDiscreteScheduler(
        **{"num_train_timesteps": 1100, "beta_start": 0.0001, "beta_end": 0.02, "beta_schedule": "linear", **config}
    )
    state = scheduler.set_timesteps(10)
    sample = dummy_sample_deter() * state.init_noise_sigma
    for t in np.asarray(state.timesteps):
        # reference test rebinds sample to the scaled input before stepping
        sample = scheduler.scale_model_input(state, sample, t)
        model_output = dummy_model(sample, t)
        sample = scheduler.step(state, model_output, t, sample).prev_sample
    return sample


def test_full_loop_no_noise():
    sample = full_loop()
    assert abs(float(jnp.sum(jnp.abs(sample))) - 10.0807) < 1e-2
    assert abs(float(jnp.mean(jnp.abs(sample))) - 0.0131) < 1e-3


def test_full_loop_v_prediction():
    sample = full_loop(prediction_type="v_prediction")
    assert abs(float(jnp.sum(jnp.abs(sample))) - 0.0002) < 1e-2


def test_full_loop_karras():
    sample = full_loop(use_karras_sigmas=True)
    assert abs(float(jnp.sum(jnp.abs(sample))) - 124.52299499511719) < 2e-2
    assert abs(float(jnp.mean(jnp.abs(sample))) - 0.16213932633399963) < 1e-3


def test_scale_model_input():
    scheduler = EulerDiscreteScheduler()
    state = scheduler.set_timesteps(10)
    t = state.timesteps[3]
    sigma = state.sigmas[3]
    sample = jnp.ones((1, 3, 8, 8))
    scaled = scheduler.scale_model_input(state, sample, t)
    np.testing.assert_allclose(np.asarray(scaled), np.asarray(sample / ((sigma**2 + 1) ** 0.5)), rtol=1e-6)


def test_index_for_timestep():
    scheduler = EulerDiscreteScheduler()
    state = scheduler.set_timesteps(10)
    for i, t in enumerate(np.asarray(state.timesteps)):
        assert int(index_for_timestep(state.timesteps, jnp.asarray(t))) == i
