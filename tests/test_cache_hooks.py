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
    # round 3: enable_cache itself validates against _supported_cache_configs
    with pytest.raises(TypeError):
        pipe.enable_cache(("not", "a", "config"))


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


def test_mag_cache_mask_semantics():
    """Mask must match the reference accumulator behavior: no skips before
    retention_step, ≤ max_skip_steps consecutive skips, first step computed."""
    from diffusers_tpu.hooks import FLUX_MAG_RATIOS, MagCacheConfig, mag_cache_compute_mask

    cfg = MagCacheConfig(
        threshold=0.12, max_skip_steps=2, retention_ratio=0.2,
        num_inference_steps=28, mag_ratios=tuple(FLUX_MAG_RATIOS),
    )
    mask = mag_cache_compute_mask(cfg)
    assert mask.shape == (28,)
    retention = int(0.2 * 28 + 0.5)
    assert mask[:retention].all(), "no skipping inside the retention window"
    assert not mask.all(), "threshold 0.12 must produce some skips"
    # bounded consecutive skips
    run = 0
    for m in mask:
        run = 0 if m else run + 1
        assert run <= 2
    # calibrate mode never skips
    assert mag_cache_compute_mask(MagCacheConfig(calibrate=True, num_inference_steps=8)).all()

    import pytest as _pytest
    with _pytest.raises(ValueError, match="mag_ratios"):
        MagCacheConfig()


def test_flux_mag_cache_close_to_uncached():
    from diffusers_tpu.hooks import MagCacheConfig
    from tests.test_pipeline_flux import get_dummy_pipeline as get_flux

    pipe = get_flux()
    kwargs = dict(
        prompt="a crystal fox",
        height=32,
        width=32,
        num_inference_steps=8,
        guidance_scale=0.0,
        output_type="latent",
        key=jax.random.PRNGKey(3),
    )
    ref = np.asarray(pipe(**kwargs).images)
    # flat ratios + generous threshold → alternating skips after retention
    pipe.enable_cache(MagCacheConfig(
        threshold=0.5, max_skip_steps=1, retention_ratio=0.25,
        num_inference_steps=8, mag_ratios=tuple([1.0] * 8),
    ))
    out = np.asarray(pipe(**kwargs).images)
    pipe.disable_cache()
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.6, f"MagCache output drifted too far: rel={rel}"
    assert not np.allclose(out, ref), "cache must actually skip some steps"


def test_layerwise_casting_policy():
    import jax.numpy as jnp

    from diffusers_tpu.hooks import apply_layerwise_casting, remove_layerwise_casting
    from diffusers_tpu.models import UNet2DModel

    model = UNet2DModel(
        sample_size=8, in_channels=3, out_channels=3, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, attention_head_dim=4, norm_num_groups=8,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    cast = apply_layerwise_casting(params, "float8_e4m3fn")

    fp8, skipped_norm = [], []
    def walk(t, path=""):
        for k, v in t.items():
            p = f"{path}.{k}" if path else k
            if isinstance(v, dict):
                walk(v, p)
            elif v.dtype == jnp.float8_e4m3fn:
                fp8.append(p)
            elif "norm" in p and k == "kernel":
                skipped_norm.append(p)
    walk(cast)
    assert fp8, "some kernels must be cast to fp8"
    assert all("norm" not in p for p in fp8), "norm layers must be skipped"
    assert all(p.endswith("kernel") or p.endswith("weight") for p in fp8)

    # forward still runs (kernel upcast happens inside Linear/Conv)
    out = model(cast, jnp.ones((1, 3, 8, 8), jnp.bfloat16), jnp.asarray(1)).sample
    assert out.shape == (1, 3, 8, 8)

    restored = remove_layerwise_casting(cast, jnp.float32)
    leaves = jax.tree_util.tree_leaves(restored)
    assert all(l.dtype != jnp.float8_e4m3fn for l in leaves)
