"""DPM-Solver++ multistep golden tests mirroring reference
`tests/schedulers/test_scheduler_dpm_multi.py`."""

import jax.numpy as jnp
import numpy as np

from diffusers_tpu.schedulers import DPMSolverMultistepScheduler

BASE_CONFIG = dict(
    num_train_timesteps=1000,
    beta_start=0.0001,
    beta_end=0.02,
    beta_schedule="linear",
    solver_order=2,
    prediction_type="epsilon",
    thresholding=False,
    sample_max_value=1.0,
    algorithm_type="dpmsolver++",
    solver_type="midpoint",
    lower_order_final=False,
    euler_at_final=False,
    variance_type=None,
    final_sigmas_type="sigma_min",
)


def dummy_sample_deter():
    batch_size, num_channels, height, width = 4, 3, 8, 8
    num_elems = batch_size * num_channels * height * width
    sample = np.arange(num_elems, dtype=np.float32)
    sample = sample.reshape(num_channels, height, width, batch_size) / num_elems
    return jnp.asarray(np.transpose(sample, (3, 0, 1, 2)))


def full_loop(**config):
    scheduler = DPMSolverMultistepScheduler(**{**BASE_CONFIG, **config})
    state = scheduler.set_timesteps(10)
    sample = dummy_sample_deter()
    for t in np.asarray(state.timesteps):
        residual = sample * t / (t + 1)
        out = scheduler.step(state, residual, t, sample)
        sample, state = out.prev_sample, out.state
    return sample


def test_full_loop_no_noise():
    sample = full_loop()
    assert abs(float(jnp.mean(jnp.abs(sample))) - 0.3301) < 1e-3


def test_full_loop_v_prediction():
    sample = full_loop(prediction_type="v_prediction")
    assert abs(float(jnp.mean(jnp.abs(sample))) - 0.2251) < 1e-3


def test_full_loop_karras_v_prediction():
    sample = full_loop(prediction_type="v_prediction", use_karras_sigmas=True)
    assert abs(float(jnp.mean(jnp.abs(sample))) - 0.2096) < 1e-3


def test_full_loop_thresholding():
    sample = full_loop(thresholding=True, dynamic_thresholding_ratio=0.87, sample_max_value=0.5)
    assert abs(float(jnp.mean(jnp.abs(sample))) - 1.1364) < 1e-3


def test_lower_order_final_default_config():
    # default config (lower_order_final=True, final_sigmas_type="zero") must not NaN
    scheduler = DPMSolverMultistepScheduler(
        **{**BASE_CONFIG, "lower_order_final": True, "final_sigmas_type": "zero"}
    )
    state = scheduler.set_timesteps(10)
    sample = dummy_sample_deter()
    for t in np.asarray(state.timesteps):
        out = scheduler.step(state, sample * 0.1, t, sample)
        sample, state = out.prev_sample, out.state
    assert np.isfinite(np.asarray(sample)).all()
