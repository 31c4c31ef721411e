"""Pipeline-level cache hooks (enable_cache API): TaylorSeer and FBC on the
scanned Flux denoise loop — parity-within-tolerance vs the uncached pipeline
(reference analogue: hooks/taylorseer_cache.py, hooks/first_block_cache.py,
models/cache_utils.py CacheMixin)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.hooks import FirstBlockCacheConfig, TaylorSeerCacheConfig
from diffusers_tpu.hooks.taylorseer import (
    init_taylorseer_state,
    taylorseer_apply,
    taylorseer_compute_mask,
)

from tests.test_pipeline_flux import get_dummy_pipeline


def _run(pipe, steps=8):
    return np.asarray(
        pipe(
            prompt="a crystal fox",
            height=32,
            width=32,
            num_inference_steps=steps,
            output_type="latent",
            key=jax.random.PRNGKey(3),
        ).images
    )


def test_taylorseer_mask_matches_reference_gating():
    cfg = TaylorSeerCacheConfig(cache_interval=5, disable_cache_before_step=3)
    mask = taylorseer_compute_mask(12, cfg)
    # steps 0-2 warmup; then (i - 3 - 1) % 5 == 0 → i = 4, 9
    assert list(np.nonzero(mask)[0]) == [0, 1, 2, 4, 9]
    cfg2 = TaylorSeerCacheConfig(cache_interval=5, disable_cache_before_step=3, disable_cache_after_step=10)
    assert list(np.nonzero(taylorseer_compute_mask(12, cfg2))[0]) == [0, 1, 2, 4, 9, 10, 11]


def test_taylorseer_extrapolation_is_exact_for_linear_sequences():
    # outputs linear in step → order-1 Taylor predicts exactly
    state = init_taylorseer_state((2, 3), max_order=1)
    ys = [jnp.full((2, 3), float(i)) for i in range(6)]
    outs = []
    for i, compute in enumerate([True, True, True, False, False, True]):
        y, state = taylorseer_apply(
            state, jnp.asarray(i, jnp.int32), jnp.asarray(compute), lambda i=i: ys[i]
        )
        outs.append(np.asarray(y))
    for i, out in enumerate(outs):
        np.testing.assert_allclose(out, np.full((2, 3), float(i)), atol=1e-6)


def test_flux_taylorseer_cache_close_to_uncached():
    pipe = get_dummy_pipeline()
    ref = _run(pipe)
    pipe.enable_cache(TaylorSeerCacheConfig(cache_interval=3, disable_cache_before_step=2, max_order=1))
    out = _run(pipe)
    pipe.disable_cache()
    # approximation, not bit-exact: most steps are predicted
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.35, f"TaylorSeer output drifted too far: rel={rel}"
    # and caching must actually change the trace (different path)
    assert not np.allclose(out, ref)


def test_flux_fbc_cache_runs_and_close_to_uncached():
    pipe = get_dummy_pipeline()
    ref = _run(pipe)
    pipe.enable_cache(FirstBlockCacheConfig(threshold=0.05))
    out = _run(pipe)
    pipe.disable_cache()
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.35, f"FBC output drifted too far: rel={rel}"


def test_unknown_cache_config_raises():
    pipe = get_dummy_pipeline()
    pipe.enable_cache(("not", "a", "config"))
    with pytest.raises(ValueError):
        _run(pipe, steps=1)
    pipe.disable_cache()


def test_sdxl_faster_cache_close_to_uncached():
    from diffusers_tpu.hooks import FasterCacheConfig
    from tests.test_pipeline_sdxl import get_dummy_pipeline as get_sdxl

    pipe = get_sdxl()
    kwargs = dict(
        prompt="a glass castle",
        height=32,
        width=32,
        num_inference_steps=8,
        guidance_scale=6.0,
        output_type="latent",
        key=jax.random.PRNGKey(5),
    )
    ref = np.asarray(pipe(**kwargs).images)
    # skip range chosen so steps 1,2,4,5,7 skip the uncond forward
    pipe.enable_cache(FasterCacheConfig(
        unconditional_batch_skip_range=3,
        unconditional_batch_timestep_skip_range=(-1, 1000),
    ))
    out = np.asarray(pipe(**kwargs).images)
    pipe.disable_cache()
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.35, f"FasterCache output drifted too far: rel={rel}"
    assert not np.allclose(out, ref)


def test_flux_pab_cache_close_to_uncached():
    from diffusers_tpu.hooks.pyramid_attention_broadcast import (
        PyramidAttentionBroadcastConfig,
        pab_compute_mask,
    )

    # mask semantics vs reference gating
    mask = pab_compute_mask(np.array([999, 900, 750, 600, 450, 300, 150, 10]), 2, (100, 800))
    # step 0 always computes; t outside (100,800) computes; inside: every 2nd
    assert list(mask) == [True, True, True, False, True, False, True, True]

    pipe = get_dummy_pipeline()
    ref = _run(pipe)
    pipe.enable_cache(PyramidAttentionBroadcastConfig(
        spatial_attention_block_skip_range=2,
        spatial_attention_timestep_skip_range=(100, 950),
    ))
    out = _run(pipe)
    pipe.disable_cache()
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.35, f"PAB output drifted too far: rel={rel}"
    assert not np.allclose(out, ref)
