"""Generic first-block cache on single-stream block stacks (Wan / SD3 / LTX).

Mirrors the reference hook pair `hooks/first_block_cache.py:66-258` applied
through `apply_first_block_cache` to any block-stack model; here the models
take `fbc_state`/`fbc_config` and gate the tail with `lax.cond`
(diffusers_tpu/hooks/first_block_cache.py::fbc_single_gate).
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffusers_tpu.hooks.first_block_cache import (
    FirstBlockCacheConfig,
    fbc_single_gate,
    init_fbc_single_state,
)


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


# ---------------------------------------------------------------- gate unit

def test_gate_computes_first_and_reuses_on_identical_residual():
    cfg = FirstBlockCacheConfig(threshold=0.05)
    state = init_fbc_single_state((1, 4, 8))
    h = jnp.ones((1, 4, 8))
    residual = jnp.full((1, 4, 8), 0.5)

    calls = []

    def tail(x):
        calls.append(1)
        return x * 2.0

    out1, state = fbc_single_gate(state, cfg, residual, h, tail)
    np.testing.assert_allclose(np.asarray(out1), 2.0)
    assert bool(state.valid)

    # identical residual -> rel change 0 -> reuse: h + cached tail residual
    out2, state = fbc_single_gate(state, cfg, residual, h + 1.0, tail)
    np.testing.assert_allclose(np.asarray(out2), (1.0 + 1.0) + 1.0)  # h' + (2h - h)

    # large residual change -> recompute
    out3, _ = fbc_single_gate(state, cfg, residual * 3.0, h, tail)
    np.testing.assert_allclose(np.asarray(out3), 2.0)


# ---------------------------------------------------------------- Wan model

def _wan_model():
    from diffusers_tpu.models.transformers.transformer_wan import WanTransformer3DModel

    model = WanTransformer3DModel(
        patch_size=(1, 2, 2), num_attention_heads=2, attention_head_dim=12,
        in_channels=4, out_channels=4, text_dim=16, freq_dim=16, ffn_dim=32,
        num_layers=2, cross_attn_norm=True, rope_max_seq_len=64,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    hidden = jnp.asarray(rng.randn(1, 4, 1, 4, 4), jnp.float32)
    ctx = jnp.asarray(rng.randn(1, 6, 16), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    return model, params, hidden, ctx, t


def test_wan_fbc_first_call_matches_plain_and_skip_is_exact():
    model, params, hidden, ctx, t = _wan_model()
    plain = model(params, hidden, t, ctx).sample

    state = init_fbc_single_state((1, 1 * 2 * 2, 24))
    cfg = FirstBlockCacheConfig(threshold=0.05)
    out1, state = model(params, hidden, t, ctx, fbc_state=state, fbc_config=cfg)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(out1.sample), atol=1e-5)

    # identical inputs -> first residual unchanged -> tail replayed exactly
    out2, _ = model(params, hidden, t, ctx, fbc_state=state, fbc_config=cfg)
    np.testing.assert_allclose(np.asarray(out1.sample), np.asarray(out2.sample), atol=1e-5)


# ---------------------------------------------------------------- SD3 model

def _sd3_model():
    from diffusers_tpu.models.transformers.transformer_sd3 import SD3Transformer2DModel

    model = SD3Transformer2DModel(
        sample_size=8, patch_size=2, in_channels=4, num_layers=2, attention_head_dim=8,
        num_attention_heads=2, joint_attention_dim=32, caption_projection_dim=16,
        pooled_projection_dim=32, out_channels=4, pos_embed_max_size=96,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    hidden = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    ctx = jnp.asarray(rng.randn(1, 6, 32), jnp.float32)
    pooled = jnp.asarray(rng.randn(1, 32), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    return model, params, hidden, ctx, pooled, t


def test_sd3_fbc_first_call_matches_plain_and_skip_is_exact():
    model, params, hidden, ctx, pooled, t = _sd3_model()
    plain = model(params, hidden, ctx, pooled, t).sample

    state = init_fbc_single_state((1, 16, 16))
    cfg = FirstBlockCacheConfig(threshold=0.05)
    out1, state = model(params, hidden, ctx, pooled, t, fbc_state=state, fbc_config=cfg)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(out1.sample), atol=1e-5)

    out2, _ = model(params, hidden, ctx, pooled, t, fbc_state=state, fbc_config=cfg)
    np.testing.assert_allclose(np.asarray(out1.sample), np.asarray(out2.sample), atol=1e-5)


# ---------------------------------------------------------------- LTX model

def _ltx_model():
    from diffusers_tpu.models.transformers.transformer_ltx import LTXVideoTransformer3DModel

    model = LTXVideoTransformer3DModel(
        in_channels=8, out_channels=8, patch_size=1, patch_size_t=1,
        num_attention_heads=2, attention_head_dim=12, cross_attention_dim=24,
        num_layers=2, caption_channels=16,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    hidden = jnp.asarray(rng.randn(1, 2 * 4 * 4, 8), jnp.float32)
    ctx = jnp.asarray(rng.randn(1, 6, 16), jnp.float32)
    mask = jnp.ones((1, 6), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    grid = model.rope.prepare_video_coords(1, 2, 4, 4, rope_interpolation_scale=(1.0, 32.0, 32.0))
    cos, sin = model.rope({}, grid)
    return model, params, hidden, ctx, mask, t, (cos, sin)


def test_ltx_fbc_first_call_matches_plain_and_skip_is_exact():
    model, params, hidden, ctx, mask, t, rope = _ltx_model()
    plain = model(params, hidden, ctx, t, encoder_attention_mask=mask, image_rotary_emb=rope).sample

    state = init_fbc_single_state((1, hidden.shape[1], 24))
    cfg = FirstBlockCacheConfig(threshold=0.05)
    out1, state = model(params, hidden, ctx, t, encoder_attention_mask=mask, image_rotary_emb=rope,
                        fbc_state=state, fbc_config=cfg)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(out1.sample), atol=1e-5)

    out2, _ = model(params, hidden, ctx, t, encoder_attention_mask=mask, image_rotary_emb=rope,
                    fbc_state=state, fbc_config=cfg)
    np.testing.assert_allclose(np.asarray(out1.sample), np.asarray(out2.sample), atol=1e-5)


# ------------------------------------------------------------- pipelines e2e

def test_wan_pipeline_fbc_threshold0_matches_dense_and_skip_runs():
    from tests.test_pipeline_wan import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    kwargs = dict(height=16, width=16, num_frames=5, num_inference_steps=4,
                  guidance_scale=5.0, key=jax.random.PRNGKey(0), output_type="latent")
    dense = pipe("a robot dancing", **kwargs).frames

    # threshold=0: every step recomputes -> must match the dense scan
    pipe.enable_cache(FirstBlockCacheConfig(threshold=0.0))
    exact = pipe("a robot dancing", **kwargs).frames
    assert _cosine(dense, exact) > 0.999

    # realistic threshold: skips allowed, output stays close
    pipe.enable_cache(FirstBlockCacheConfig(threshold=0.3))
    cached = pipe("a robot dancing", **kwargs).frames
    assert np.isfinite(np.asarray(cached)).all()
    assert _cosine(dense, cached) > 0.9
    pipe.disable_cache()


def test_sd3_pipeline_fbc_threshold0_matches_dense():
    import sys, pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from test_pipelines_img2img_inpaint_sd3 import test_sd3_pipeline  # noqa: F401 (fixture source)
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.clip import CLIPTextModelWithProjection
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.models.transformers.transformer_sd3 import SD3Transformer2DModel
    from diffusers_tpu.pipelines.stable_diffusion_3.pipeline_stable_diffusion_3 import StableDiffusion3Pipeline
    from diffusers_tpu.schedulers import FlowMatchEulerDiscreteScheduler
    from test_pipeline_stable_diffusion import DummyTokenizer

    key = jax.random.PRNGKey(0)
    transformer = SD3Transformer2DModel(
        sample_size=8, patch_size=2, in_channels=4, num_layers=2, attention_head_dim=8,
        num_attention_heads=2, joint_attention_dim=32, caption_projection_dim=16,
        pooled_projection_dim=32, out_channels=4, pos_embed_max_size=96,
    )
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,), down_block_types=("DownEncoderBlock2D",),
        up_block_types=("UpDecoderBlock2D",), latent_channels=4, layers_per_block=1,
        norm_num_groups=4, sample_size=8, scaling_factor=1.5, shift_factor=0.06,
    )
    te = CLIPTextModelWithProjection(vocab_size=1000, hidden_size=8, intermediate_size=16,
                                     num_hidden_layers=1, num_attention_heads=2, projection_dim=16)
    t5 = T5EncoderModel(vocab_size=1000, d_model=32, d_kv=8, d_ff=32, num_layers=1, num_heads=2,
                        feed_forward_proj="gated-gelu")
    pipe = StableDiffusion3Pipeline(
        transformer=(transformer, transformer.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(shift=3.0),
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=DummyTokenizer(),
        text_encoder_2=(te, te.init_params(key)),
        tokenizer_2=DummyTokenizer(),
        text_encoder_3=(t5, t5.init_params(key)),
        tokenizer_3=DummyTokenizer(),
    )
    kwargs = dict(height=8, width=8, num_inference_steps=4, guidance_scale=5.0,
                  max_sequence_length=16, key=key, output_type="latent")
    dense = pipe("a painting", **kwargs).images
    pipe.enable_cache(FirstBlockCacheConfig(threshold=0.0))
    exact = pipe("a painting", **kwargs).images
    assert _cosine(dense, exact) > 0.999
    pipe.enable_cache(FirstBlockCacheConfig(threshold=0.3))
    cached = pipe("a painting", **kwargs).images
    assert np.isfinite(np.asarray(cached)).all()
    pipe.disable_cache()


def test_ltx_pipeline_fbc_threshold0_matches_dense():
    from tests.test_pipeline_ltx import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    kwargs = dict(height=16, width=16, num_frames=5, num_inference_steps=4,
                  guidance_scale=3.0, key=jax.random.PRNGKey(0), output_type="latent")
    dense = pipe("a river of stars", **kwargs).frames
    pipe.enable_cache(FirstBlockCacheConfig(threshold=0.0))
    exact = pipe("a river of stars", **kwargs).frames
    assert _cosine(dense, exact) > 0.999
    pipe.enable_cache(FirstBlockCacheConfig(threshold=0.3))
    cached = pipe("a river of stars", **kwargs).frames
    assert np.isfinite(np.asarray(cached)).all()
    pipe.disable_cache()
