"""Wan variant pipelines: video2video (strength init) and Animate
(segmented character animation / replacement).

Reference: `/root/reference/src/diffusers/pipelines/wan/pipeline_wan_video2video.py:176`,
`pipeline_wan_animate.py:150`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_wan_video2video():
    from diffusers_tpu import WanVideoToVideoPipeline
    from test_pipeline_wan import get_dummy_pipeline

    base = get_dummy_pipeline()
    pipe = WanVideoToVideoPipeline(**base.components)
    vid = np.random.RandomState(0).rand(1, 3, 5, 16, 16).astype(np.float32) * 2 - 1
    out = pipe("a robot dancing", video=jnp.asarray(vid), strength=0.8, height=16, width=16,
               num_inference_steps=4, guidance_scale=5.0,
               key=jax.random.PRNGKey(0), output_type="np").frames
    assert out.shape[0] == 1 and out.shape[-1] == 3
    assert np.isfinite(out).all()

    # lower strength stays closer to the VAE round-trip of the input
    near = pipe("a robot dancing", video=jnp.asarray(vid), strength=0.25, height=16, width=16,
                num_inference_steps=4, guidance_scale=5.0,
                key=jax.random.PRNGKey(0), output_type="np").frames
    assert np.abs(near - out).max() > 1e-6


def _animate_pipe():
    from diffusers_tpu import WanAnimatePipeline
    from diffusers_tpu.models.text_encoders.clip import CLIPVisionModel
    from diffusers_tpu.models.transformers.transformer_wan_animate import (
        WanAnimateTransformer3DModel,
    )
    from test_pipeline_wan import get_dummy_pipeline

    base = get_dummy_pipeline()
    key = jax.random.PRNGKey(0)
    transformer = WanAnimateTransformer3DModel(
        patch_size=(1, 2, 2), num_attention_heads=2, attention_head_dim=12,
        latent_channels=4, in_channels=12, out_channels=4, text_dim=16, freq_dim=16,
        ffn_dim=32, num_layers=2, image_dim=8, rope_max_seq_len=64,
        motion_encoder_size=16, motion_style_dim=8, motion_dim=4, motion_encoder_dim=8,
        face_encoder_hidden_dim=8, face_encoder_num_heads=2, inject_face_latents_blocks=1,
        motion_encoder_channel_sizes={"4": 8, "8": 8, "16": 8},
    )
    clip = CLIPVisionModel(hidden_size=8, intermediate_size=16, num_hidden_layers=2,
                           num_attention_heads=2, image_size=16, patch_size=8)
    comps = dict(base.components)
    comps["transformer"] = (transformer, transformer.init_params(key))
    return WanAnimatePipeline(image_encoder=(clip, clip.init_params(key)),
                              image_processor=None, **comps)


@pytest.mark.parametrize("mode", ["animate", "replace"])
def test_wan_animate_pipeline(mode):
    pipe = _animate_pipe()
    rng = np.random.RandomState(0)
    rt = pipe.vae_scale_factor_temporal  # 2 in the tiny fixture
    seg = 2 * rt + 1  # 5-frame segments
    n_frames = 7  # forces 2 segments with reflect padding
    image = rng.rand(1, 3, 16, 16).astype(np.float32)
    pose = rng.rand(1, 3, n_frames, 16, 16).astype(np.float32) * 2 - 1
    face = rng.rand(1, 3, n_frames, 16, 16).astype(np.float32) * 2 - 1
    kwargs = {}
    if mode == "replace":
        kwargs["background_video"] = [rng.rand(16, 16, 3).astype(np.float32) for _ in range(n_frames)]
        kwargs["mask_video"] = [np.ones((16, 16, 3), np.float32) for _ in range(n_frames)]
    out = pipe(image=jnp.asarray(image * 2 - 1), pose_video=jnp.asarray(pose),
               face_video=jnp.asarray(face), prompt="a dancer", height=16, width=16,
               segment_frame_length=seg, num_inference_steps=2, guidance_scale=5.0,
               mode=mode, key=jax.random.PRNGKey(0), output_type="np", **kwargs).frames
    assert out.shape[1] == n_frames and out.shape[-1] == 3
    assert np.isfinite(out).all()
