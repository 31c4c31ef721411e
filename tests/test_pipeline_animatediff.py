"""AnimateDiff pipeline behavior tests (fast hermetic tier)."""

import jax
import numpy as np

from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
from diffusers_tpu.models.text_encoders.clip import CLIPTextModel
from diffusers_tpu.models.unets.unet_motion_model import UNetMotionModel
from diffusers_tpu.pipelines.animatediff import AnimateDiffPipeline
from diffusers_tpu.schedulers.scheduling_ddim import DDIMScheduler
from tests.test_pipeline_stable_diffusion import DummyTokenizer


def get_dummy_pipeline():
    key = jax.random.PRNGKey(0)
    unet = UNetMotionModel(
        sample_size=8,
        in_channels=4,
        out_channels=4,
        down_block_types=("CrossAttnDownBlockMotion", "DownBlockMotion"),
        up_block_types=("UpBlockMotion", "CrossAttnUpBlockMotion"),
        block_out_channels=(8, 16),
        layers_per_block=1,
        num_attention_heads=2,
        cross_attention_dim=16,
        norm_num_groups=4,
        motion_num_attention_heads=2,
        use_motion_mid_block=True,
    )
    unet_params = unet.init_params(key)
    vae = AutoencoderKL(
        in_channels=3,
        out_channels=3,
        block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",),
        up_block_types=("UpDecoderBlock2D",),
        latent_channels=4,
        layers_per_block=1,
        norm_num_groups=4,
        sample_size=16,
    )
    vae_params = vae.init_params(key)
    te = CLIPTextModel(
        vocab_size=1000,
        hidden_size=16,
        intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        max_position_embeddings=77,
    )
    te_params = te.init_params(key)
    scheduler = DDIMScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear", clip_sample=False,
        set_alpha_to_one=False, steps_offset=1,
    )
    return AnimateDiffPipeline(
        vae=(vae, vae_params),
        text_encoder=(te, te_params),
        tokenizer=DummyTokenizer(),
        unet=(unet, unet_params),
        motion_adapter=None,
        scheduler=scheduler,
    )


def test_t2v_shapes():
    pipe = get_dummy_pipeline()
    out = pipe("a cat surfing", num_frames=3, num_inference_steps=2, guidance_scale=6.0,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.frames.shape == (1, 3, 8, 8, 3)
    assert np.isfinite(out.frames).all()


def test_cfg_and_freeinit():
    pipe = get_dummy_pipeline()
    a = pipe("a cat", num_frames=2, num_inference_steps=2, guidance_scale=1.0,
             key=jax.random.PRNGKey(0), output_type="np").frames
    b = pipe("a cat", num_frames=2, num_inference_steps=2, guidance_scale=7.0,
             key=jax.random.PRNGKey(0), output_type="np").frames
    assert np.abs(a - b).max() > 1e-6

    pipe.enable_free_init(num_iters=2, use_fast_sampling=False)
    c = pipe("a cat", num_frames=2, num_inference_steps=2, guidance_scale=7.0,
             key=jax.random.PRNGKey(0), output_type="np").frames
    pipe.disable_free_init()
    assert np.isfinite(c).all()
    assert np.abs(c - b).max() > 1e-6
