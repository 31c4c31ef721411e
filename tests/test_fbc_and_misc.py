"""First-block cache, video processor, export utils, CLI tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from diffusers_tpu.hooks.first_block_cache import FBCState, FirstBlockCacheConfig, flux_forward_with_fbc, init_fbc_state
from diffusers_tpu.models.transformers.transformer_flux import FluxTransformer2DModel
from diffusers_tpu.video_processor import VideoProcessor

TINY = dict(
    patch_size=1, in_channels=4, num_layers=2, num_single_layers=2,
    attention_head_dim=8, num_attention_heads=2, joint_attention_dim=16,
    pooled_projection_dim=16, axes_dims_rope=(2, 4, 2),
)


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    img_ids = np.zeros((8, 3), np.float32)
    txt_ids = np.zeros((4, 3), np.float32)
    model = FluxTransformer2DModel(**TINY)
    cos, sin = model.pos_embed({}, np.concatenate([txt_ids, img_ids], 0))
    return model, dict(
        hidden_states=jnp.asarray(rng.randn(1, 8, 4), jnp.float32),
        encoder_hidden_states=jnp.asarray(rng.randn(1, 4, 16), jnp.float32),
        pooled_projections=jnp.asarray(rng.randn(1, 16), jnp.float32),
        timestep=jnp.asarray([0.5], jnp.float32),
        image_rotary_emb=(jnp.asarray(cos), jnp.asarray(sin)),
    )


def test_fbc_first_step_matches_plain_forward():
    model, ins = _inputs()
    params = model.init_params(jax.random.PRNGKey(0))
    plain = model(params, **ins).sample
    state = init_fbc_state((1, 8, 16), (1, 4, 16))
    cached, new_state = flux_forward_with_fbc(model, params, state, FirstBlockCacheConfig(0.05), **ins)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(cached), atol=1e-5)
    assert bool(new_state.valid)


def test_fbc_skips_on_identical_inputs():
    model, ins = _inputs()
    params = model.init_params(jax.random.PRNGKey(0))
    state = init_fbc_state((1, 8, 16), (1, 4, 16))
    cfg = FirstBlockCacheConfig(threshold=0.05)
    out1, state = flux_forward_with_fbc(model, params, state, cfg, **ins)
    # same inputs -> residual diff is 0 -> tail skipped, result must match exactly
    out2, state = flux_forward_with_fbc(model, params, state, cfg, **ins)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_video_processor_roundtrip():
    vp = VideoProcessor(vae_scale_factor=8)
    video = np.random.RandomState(0).rand(1, 4, 8, 8, 3).astype(np.float32)
    pre = vp.preprocess_video(video)
    assert pre.shape == (1, 3, 4, 8, 8)
    assert pre.min() >= -1.0 and pre.max() <= 1.0
    post = vp.postprocess_video(pre)
    np.testing.assert_allclose(post, video, atol=1e-6)


def test_export_gif_and_obj(tmp_path):
    from PIL import Image

    from diffusers_tpu.utils.export_utils import export_to_gif, export_to_obj

    frames = [Image.new("RGB", (8, 8), (i * 30, 0, 0)) for i in range(3)]
    gif = export_to_gif(frames, str(tmp_path / "x.gif"))
    assert os.path.getsize(gif) > 0

    mesh = {"verts": np.random.rand(4, 3), "faces": [[0, 1, 2], [1, 2, 3]]}
    obj = export_to_obj(mesh, str(tmp_path / "x.obj"))
    assert os.path.getsize(obj) > 0


def test_cli_env(capsys):
    import sys

    from diffusers_tpu.commands.diffusers_cli import main

    old = sys.argv
    sys.argv = ["diffusers-tpu-cli", "env"]
    try:
        main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert "diffusers_tpu" in out and "jax" in out


def test_video_processor_input_matrix():
    """Reference `video_processor.py:28` input matrix: PIL lists, 4D/5D arrays
    in either layout, lists of videos."""
    from PIL import Image

    vp = VideoProcessor(vae_scale_factor=8)
    frames = [Image.new("RGB", (16, 16), (i * 20, 0, 0)) for i in range(4)]
    assert vp.preprocess_video(frames).shape == (1, 3, 4, 16, 16)
    assert vp.preprocess_video([frames, frames]).shape == (2, 3, 4, 16, 16)
    v_hwc = np.random.rand(4, 16, 16, 3).astype(np.float32)
    assert vp.preprocess_video(v_hwc).shape == (1, 3, 4, 16, 16)
    v_chw = np.random.rand(4, 3, 16, 16).astype(np.float32)
    assert vp.preprocess_video(v_chw).shape == (1, 3, 4, 16, 16)
    assert vp.preprocess_video([v_chw, v_chw]).shape == (2, 3, 4, 16, 16)
    v5 = np.random.rand(2, 3, 4, 16, 16).astype(np.float32)
    assert vp.preprocess_video(v5).shape == (2, 3, 4, 16, 16)
    pil = vp.postprocess_video(vp.preprocess_video(frames), output_type="pil")
    assert len(pil) == 1 and len(pil[0]) == 4
    lat = vp.postprocess_video(v5, output_type="latent")
    assert lat is v5
