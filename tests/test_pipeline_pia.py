"""PIA (Personalized Image Animator) deprecated pipeline tests.

Reference: pipelines/deprecated/pia/pipeline_pia.py:560 (PIAPipeline),
:106 (prepare_mask_coef_by_statistics)."""

import jax
import numpy as np
import pytest

from diffusers_tpu.pipelines.deprecated.pia import (
    PIAPipeline,
    prepare_mask_coef_by_statistics,
)


def get_dummy_pia_pipeline():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.clip import CLIPTextModel
    from diffusers_tpu.models.unets.unet_motion_model import UNetMotionModel
    from diffusers_tpu.schedulers.scheduling_ddim import DDIMScheduler
    from tests.test_pipeline_stable_diffusion import DummyTokenizer

    key = jax.random.PRNGKey(0)
    unet = UNetMotionModel(
        sample_size=8, in_channels=9, out_channels=4,
        down_block_types=("CrossAttnDownBlockMotion", "DownBlockMotion"),
        up_block_types=("UpBlockMotion", "CrossAttnUpBlockMotion"),
        block_out_channels=(8, 16), layers_per_block=1, num_attention_heads=2,
        cross_attention_dim=16, norm_num_groups=4, motion_num_attention_heads=2,
        use_motion_mid_block=True,
    )
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=16,
    )
    te = CLIPTextModel(vocab_size=1000, hidden_size=16, intermediate_size=32,
                       num_hidden_layers=2, num_attention_heads=2,
                       max_position_embeddings=77)
    scheduler = DDIMScheduler(beta_start=0.00085, beta_end=0.012,
                              beta_schedule="scaled_linear", clip_sample=False,
                              set_alpha_to_one=False, steps_offset=1)
    return PIAPipeline(
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=DummyTokenizer(),
        unet=(unet, unet.init_params(key)),
        motion_adapter=None,
        scheduler=scheduler,
    )


def test_mask_coef_matches_reference_table():
    # small motion, cond on frame 0, 8 frames: decays then holds the tail
    coef = prepare_mask_coef_by_statistics(8, 0, 0)
    assert coef == [1.0, 0.9, 0.85, 0.85, 0.85, 0.8, 0.8, 0.8]
    # distance-reordering around an interior condition frame
    coef = prepare_mask_coef_by_statistics(5, 2, 0)
    assert coef == [0.85, 0.9, 1.0, 0.9, 0.85]
    with pytest.raises(ValueError):
        prepare_mask_coef_by_statistics(3, 5, 0)
    with pytest.raises(ValueError):
        prepare_mask_coef_by_statistics(8, 0, 99)


def test_pia_image_to_video():
    pipe = get_dummy_pia_pipeline()
    image = np.zeros((1, 3, 32, 32), dtype=np.float32)
    out = pipe(image=image, prompt="a waving flag", num_frames=5, height=32, width=32,
               num_inference_steps=2, guidance_scale=7.5, motion_scale=1,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.frames.shape == (1, 5, 32, 32, 3)
    assert np.isfinite(out.frames).all()


def test_pia_strength_and_motion_scale_change_output():
    pipe = get_dummy_pia_pipeline()
    image = np.full((1, 3, 32, 32), 0.25, dtype=np.float32)
    kwargs = dict(image=image, prompt="drift", num_frames=5, height=32, width=32,
                  num_inference_steps=2, key=jax.random.PRNGKey(1), output_type="latent")
    full = np.asarray(pipe(**kwargs, strength=1.0).frames)
    partial_ = np.asarray(pipe(**kwargs, strength=0.5).frames)
    assert not np.allclose(full, partial_)
    m0 = np.asarray(pipe(**kwargs, motion_scale=0).frames)
    m2 = np.asarray(pipe(**kwargs, motion_scale=2).frames)
    assert not np.allclose(m0, m2)
