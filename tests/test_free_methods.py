"""FreeU / FreeInit / FreeNoise."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusers_tpu.pipelines.free_init_utils import (
    FreeInitConfig,
    apply_freq_filter,
    get_free_init_freq_filter,
)
from diffusers_tpu.pipelines.free_noise_utils import (
    free_noise_blend_windows,
    prepare_free_noise_latents,
)
from diffusers_tpu.utils.freeu_utils import fourier_filter


def test_fourier_filter_identity_and_attenuation():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4), jnp.float32)
    np.testing.assert_allclose(fourier_filter(x, threshold=1, scale=1.0), x, atol=1e-5)
    lo = fourier_filter(x, threshold=4, scale=0.0)  # kill all (shifted) freqs
    assert np.abs(np.asarray(lo)).max() < 1e-4


def test_freeu_changes_sd_output_and_disables_cleanly():
    from tests.test_pipeline_stable_diffusion import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    kwargs = dict(prompt="a cat", height=32, width=32, num_inference_steps=2,
                  guidance_scale=6.0, output_type="latent", key=jax.random.PRNGKey(0))
    ref = np.asarray(pipe(**kwargs).images)
    pipe.enable_freeu(s1=0.9, s2=0.2, b1=1.2, b2=1.4)
    out = np.asarray(pipe(**kwargs).images)
    assert not np.allclose(out, ref), "FreeU must change the output"
    pipe.disable_freeu()
    back = np.asarray(pipe(**kwargs).images)
    np.testing.assert_allclose(back, ref, atol=1e-5)


def test_free_init_filter_and_mix():
    cfg = FreeInitConfig(method="butterworth", order=4,
                         spatial_stop_frequency=0.25, temporal_stop_frequency=0.25)
    lpf = get_free_init_freq_filter((1, 4, 4, 8, 8), cfg)
    assert lpf.shape == (4, 8, 8)
    assert float(lpf[2, 4, 4]) > 0.9  # DC (center after fftshift) passes
    assert float(lpf[0, 0, 0]) < 0.1  # corners (high freq) blocked

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 4, 8, 8), jnp.float32)
    n = jnp.asarray(rng.randn(1, 4, 4, 8, 8), jnp.float32)
    np.testing.assert_allclose(apply_freq_filter(x, n, jnp.ones((4, 8, 8))), x, atol=1e-4)
    np.testing.assert_allclose(apply_freq_filter(x, n, jnp.zeros((4, 8, 8))), n, atol=1e-4)

    for method in ("gaussian", "ideal"):
        m = get_free_init_freq_filter((1, 4, 4, 8, 8), FreeInitConfig(method=method))
        assert m.shape == (4, 8, 8)


def test_free_init_wan_pipeline_runs():
    from tests.test_pipeline_wan import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    kwargs = dict(prompt="a river", height=32, width=32, num_frames=5,
                  num_inference_steps=2, guidance_scale=1.0, output_type="latent",
                  key=jax.random.PRNGKey(0))
    ref = np.asarray(pipe(**kwargs).frames)
    pipe.enable_free_init(num_iters=2, method="butterworth")
    out = np.asarray(pipe(**kwargs).frames)
    pipe.disable_free_init()
    assert out.shape == ref.shape
    assert not np.allclose(out, ref), "FreeInit second iteration must change the result"


def test_free_noise_latents_correlation():
    key = jax.random.PRNGKey(0)
    lat = prepare_free_noise_latents((1, 4, 12, 8, 8), key, context_length=4, context_stride=2)
    assert lat.shape == (1, 4, 12, 8, 8)
    frames = np.asarray(lat)[0, 0]  # [T, H, W]
    # frames beyond the context are exact copies of earlier frames (shuffled repeat)
    base = frames[:4]
    for t in range(4, 12):
        diffs = [np.abs(frames[t] - b).max() for b in frames[:t]]
        assert min(diffs) < 1e-6, f"frame {t} is not a repeat of any earlier frame"
    # but not plain tiling: full sequence isn't exactly periodic with period 4
    assert not all(np.allclose(frames[t], frames[t % 4]) for t in range(4, 12))


def test_free_noise_blend_windows():
    a = jnp.ones((1, 2, 4, 2, 2)) * 1.0
    b = jnp.ones((1, 2, 4, 2, 2)) * 3.0
    blended = free_noise_blend_windows([a, b], [0, 2], total_frames=6)
    assert blended.shape == (1, 2, 6, 2, 2)
    np.testing.assert_allclose(blended[:, :, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(blended[:, :, 5], 3.0, atol=1e-6)
    mid = np.asarray(blended[:, :, 2:4])
    assert (1.0 < mid).all() and (mid < 3.0).all()
