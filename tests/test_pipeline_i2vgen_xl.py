"""I2VGen-XL pipeline e2e with tiny hermetic components (reference
strategy: tests/pipelines/i2vgen_xl/test_i2vgenxl.py)."""

import jax
import numpy as np

from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
from diffusers_tpu.models.text_encoders.clip import CLIPTextModel, CLIPVisionModelWithProjection
from diffusers_tpu.models.unets.unet_i2vgen_xl import I2VGenXLUNet
from diffusers_tpu.pipelines.deprecated.i2vgen_xl import I2VGenXLPipeline
from diffusers_tpu.schedulers import DDIMScheduler

from tests.test_pipeline_sdxl import DummyTokenizer


def get_dummy_pipeline():
    key = jax.random.PRNGKey(0)
    unet = I2VGenXLUNet(
        sample_size=8,
        in_channels=4,
        out_channels=4,
        down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
        up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
        block_out_channels=(8, 16),
        layers_per_block=1,
        norm_num_groups=4,
        cross_attention_dim=16,
        attention_head_dim=4,
    )
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=8,
    )
    te = CLIPTextModel(
        vocab_size=1000, hidden_size=16, intermediate_size=32, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=77, projection_dim=16,
    )
    ie = CLIPVisionModelWithProjection(
        hidden_size=16, intermediate_size=32, num_hidden_layers=1, num_attention_heads=2,
        image_size=8, patch_size=4, projection_dim=16,
    )
    scheduler = DDIMScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        clip_sample=False, set_alpha_to_one=False,
    )
    return I2VGenXLPipeline(
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=DummyTokenizer(),
        image_encoder=(ie, ie.init_params(key)),
        unet=(unet, unet.init_params(key)),
        scheduler=scheduler,
    )


def test_i2vgen_xl_image2video():
    pipe = get_dummy_pipeline()
    image = np.random.RandomState(0).rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    out = pipe("a boat sailing", image=image, height=8, width=8, num_frames=3,
               num_inference_steps=2, guidance_scale=9.0,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.frames.shape == (1, 3, 8, 8, 3)
    assert np.isfinite(out.frames).all()


def test_i2vgen_xl_no_cfg_latent():
    pipe = get_dummy_pipeline()
    image = np.random.RandomState(1).rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    lat = pipe("x", image=image, height=8, width=8, num_frames=3, num_inference_steps=1,
               guidance_scale=1.0, key=jax.random.PRNGKey(1), output_type="latent").frames
    assert lat.shape == (1, 4, 3, 8, 8)
