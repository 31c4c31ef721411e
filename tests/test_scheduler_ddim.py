"""DDIM golden tests mirroring reference `tests/schedulers/test_scheduler_ddim.py`."""

import jax.numpy as jnp
import numpy as np

from diffusers_tpu.schedulers import DDIMScheduler


def dummy_sample_deter():
    batch_size, num_channels, height, width = 4, 3, 8, 8
    num_elems = batch_size * num_channels * height * width
    sample = np.arange(num_elems, dtype=np.float32)
    sample = sample.reshape(num_channels, height, width, batch_size) / num_elems
    return jnp.asarray(np.transpose(sample, (3, 0, 1, 2)))


def dummy_model(sample, t):
    return sample * t / (t + 1)


def full_loop(**config):
    scheduler = DDIMScheduler(**{"beta_start": 0.0001, "beta_end": 0.02, "beta_schedule": "linear", **config})
    state = scheduler.set_timesteps(10)
    sample = dummy_sample_deter()
    for t in np.asarray(state.timesteps):
        residual = dummy_model(sample, float(t))
        sample = scheduler.step(state, residual, int(t), sample, eta=0.0).prev_sample
    return sample


def test_full_loop_no_noise():
    sample = full_loop()
    assert abs(float(jnp.sum(jnp.abs(sample))) - 172.0067) < 1e-2
    assert abs(float(jnp.mean(jnp.abs(sample))) - 0.223967) < 1e-3


def test_full_loop_v_prediction():
    sample = full_loop(prediction_type="v_prediction")
    assert abs(float(jnp.sum(jnp.abs(sample))) - 52.5302) < 1e-2
    assert abs(float(jnp.mean(jnp.abs(sample))) - 0.0684) < 1e-3


def test_full_loop_set_alpha_to_one():
    sample = full_loop(set_alpha_to_one=True, beta_start=0.01)
    assert abs(float(jnp.sum(jnp.abs(sample))) - 149.8295) < 1e-2


def test_full_loop_no_set_alpha_to_one():
    sample = full_loop(set_alpha_to_one=False, beta_start=0.01)
    assert abs(float(jnp.sum(jnp.abs(sample))) - 149.0784) < 1e-2


def test_steps_offset_timesteps():
    scheduler = DDIMScheduler(steps_offset=1)
    state = scheduler.set_timesteps(5)
    np.testing.assert_array_equal(np.asarray(state.timesteps), [801, 601, 401, 201, 1])
