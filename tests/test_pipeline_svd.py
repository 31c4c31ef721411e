"""Stable Video Diffusion pipeline behavior tests (fast hermetic tier)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusers_tpu.models.autoencoders.autoencoder_kl_temporal_decoder import AutoencoderKLTemporalDecoder
from diffusers_tpu.models.text_encoders.clip import CLIPVisionModelWithProjection
from diffusers_tpu.models.unets.unet_spatio_temporal_condition import UNetSpatioTemporalConditionModel
from diffusers_tpu.pipelines.stable_video_diffusion import StableVideoDiffusionPipeline
from diffusers_tpu.schedulers.scheduling_euler_discrete import EulerDiscreteScheduler


def get_dummy_pipeline():
    key = jax.random.PRNGKey(0)
    unet = UNetSpatioTemporalConditionModel(
        sample_size=4,
        in_channels=8,
        out_channels=4,
        down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
        up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
        block_out_channels=(32, 64),
        layers_per_block=1,
        num_attention_heads=2,
        cross_attention_dim=16,
        addition_time_embed_dim=4,
        projection_class_embeddings_input_dim=12,
        num_frames=3,
    )
    vae = AutoencoderKLTemporalDecoder(
        in_channels=3,
        out_channels=3,
        down_block_types=("DownEncoderBlock2D",),
        block_out_channels=(32,),
        layers_per_block=1,
        latent_channels=4,
        sample_size=32,
    )
    image_encoder = CLIPVisionModelWithProjection(
        hidden_size=16,
        intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        image_size=32,
        patch_size=8,
        projection_dim=16,
    )
    scheduler = EulerDiscreteScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        interpolation_type="linear", timestep_spacing="leading", steps_offset=1,
    )
    return StableVideoDiffusionPipeline(
        vae=(vae, vae.init_params(key)),
        image_encoder=(image_encoder, image_encoder.init_params(key)),
        unet=(unet, unet.init_params(key)),
        scheduler=scheduler,
    )


def test_i2v_shapes_and_guidance():
    pipe = get_dummy_pipeline()
    image = np.random.RandomState(0).randn(1, 3, 32, 32).astype(np.float32).clip(-1, 1)
    out = pipe(image, height=32, width=32, num_frames=3, num_inference_steps=2,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.frames.shape == (1, 3, 32, 32, 3)
    assert np.isfinite(out.frames).all()

    b = pipe(image, height=32, width=32, num_frames=3, num_inference_steps=2,
             min_guidance_scale=1.0, max_guidance_scale=1.0,
             key=jax.random.PRNGKey(0), output_type="np").frames
    assert np.abs(out.frames - b).max() > 1e-6


def test_latent_output():
    pipe = get_dummy_pipeline()
    image = np.zeros((1, 3, 32, 32), dtype=np.float32)
    out = pipe(image, height=32, width=32, num_frames=2, num_inference_steps=2,
               key=jax.random.PRNGKey(1), output_type="latent")
    assert out.frames.shape == (1, 2, 4, 32, 32)
