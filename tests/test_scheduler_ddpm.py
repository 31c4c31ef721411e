"""DDPM scheduler golden tests.

The full-loop goldens (result_sum=258.9606, result_mean=0.3372) come from the
reference's `tests/schedulers/test_scheduler_ddpm.py:103-104`. The reference
draws per-step variance noise from torch.manual_seed(0); we reproduce the
identical noise stream with torch CPU and feed it into the functional `step`.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusers_tpu.schedulers import DDPMScheduler


def dummy_sample_deter():
    batch_size, num_channels, height, width = 4, 3, 8, 8
    num_elems = batch_size * num_channels * height * width
    sample = np.arange(num_elems, dtype=np.float32)
    sample = sample.reshape(num_channels, height, width, batch_size) / num_elems
    return jnp.asarray(np.transpose(sample, (3, 0, 1, 2)))


def dummy_model(sample, t):
    return sample * t / (t + 1)


@pytest.mark.parametrize(
    "prediction_type,expected_sum,expected_mean",
    [
        ("epsilon", 258.9606, 0.3372),
        ("v_prediction", 202.0296, 0.2631),
    ],
)
def test_full_loop_golden(prediction_type, expected_sum, expected_mean):
    scheduler = DDPMScheduler(prediction_type=prediction_type)
    state = scheduler.set_timesteps()  # full 1000-step training schedule
    num_trained_timesteps = len(scheduler)

    sample = dummy_sample_deter()
    generator = torch.manual_seed(0)

    for t in reversed(range(num_trained_timesteps)):
        residual = dummy_model(sample, t)
        noise = jnp.asarray(torch.randn(sample.shape, generator=generator).numpy())
        sample = scheduler.step(state, residual, t, sample, variance_noise=noise).prev_sample

    result_sum = float(jnp.sum(jnp.abs(sample)))
    result_mean = float(jnp.mean(jnp.abs(sample)))
    assert abs(result_sum - expected_sum) < 1e-2
    assert abs(result_mean - expected_mean) < 1e-3


def test_variance_values():
    # Reference test_scheduler_ddpm.py variance goldens
    scheduler = DDPMScheduler()
    state = scheduler.set_timesteps()

    def get_variance(t):
        acp = state.alphas_cumprod
        alpha_prod_t = acp[t]
        alpha_prod_t_prev = acp[t - 1] if t > 0 else jnp.asarray(1.0)
        return float(scheduler._get_variance(alpha_prod_t, alpha_prod_t_prev))

    assert abs(get_variance(0) - 0.0) < 1e-5
    assert abs(get_variance(487) - 0.00979) < 1e-5
    assert abs(get_variance(999) - 0.02) < 1e-5


def test_add_noise_shapes():
    scheduler = DDPMScheduler()
    state = scheduler.set_timesteps(50)
    sample = dummy_sample_deter()
    noise = jnp.ones_like(sample)
    ts = jnp.array([1, 100, 999, 500])
    noisy = scheduler.add_noise(state, sample, noise, ts)
    assert noisy.shape == sample.shape


def test_timestep_spacing_leading():
    scheduler = DDPMScheduler()
    state = scheduler.set_timesteps(50)
    assert state.timesteps.shape == (50,)
    assert int(state.timesteps[0]) == 980
    assert int(state.timesteps[-1]) == 0


def test_config_roundtrip(tmp_path):
    scheduler = DDPMScheduler(beta_start=0.001, variance_type="fixed_large")
    scheduler.save_pretrained(tmp_path)
    loaded = DDPMScheduler.from_pretrained(tmp_path)
    assert loaded.config.beta_start == 0.001
    assert loaded.config.variance_type == "fixed_large"
    np.testing.assert_allclose(loaded.alphas_cumprod, scheduler.alphas_cumprod)
