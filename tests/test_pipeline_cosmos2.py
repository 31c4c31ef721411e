"""Cosmos-Predict2 text-to-image pipeline e2e with tiny components."""

import jax
import numpy as np

from diffusers_tpu.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
from diffusers_tpu.models.transformers.transformer_cosmos import CosmosTransformer3DModel
from diffusers_tpu.pipelines.cosmos.pipeline_cosmos2_text2image import Cosmos2TextToImagePipeline
from diffusers_tpu.schedulers import FlowMatchEulerDiscreteScheduler

from tests.test_pipeline_wan import DummyTokenizer


def get_dummy_pipeline():
    key = jax.random.PRNGKey(0)
    transformer = CosmosTransformer3DModel(
        in_channels=4,
        out_channels=4,
        num_attention_heads=2,
        attention_head_dim=12,
        num_layers=2,
        mlp_ratio=2.0,
        text_embed_dim=16,
        adaln_lora_dim=8,
        max_size=(16, 32, 32),
        patch_size=(1, 2, 2),
        rope_scale=(1.0, 1.0, 1.0),
        concat_padding_mask=True,
    )
    vae = AutoencoderKLWan(
        base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1, attn_scales=[],
        temperal_downsample=[False, True],
        latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
        scale_factor_temporal=2, scale_factor_spatial=2,
    )
    t5 = T5EncoderModel(vocab_size=512, d_model=16, d_kv=8, d_ff=32, num_layers=1, num_heads=2,
                        feed_forward_proj="gated-gelu")
    scheduler = FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=False, shift=1.0)
    return Cosmos2TextToImagePipeline(
        text_encoder=(t5, t5.init_params(key)),
        tokenizer=DummyTokenizer(),
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)),
        scheduler=scheduler,
    )


def test_cosmos2_text2image():
    pipe = get_dummy_pipeline()
    out = pipe("a futuristic city", height=16, width=32, num_inference_steps=2,
               guidance_scale=7.0, key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 16, 32, 3)
    assert np.isfinite(out.images).all()


def test_cosmos2_latent_output():
    pipe = get_dummy_pipeline()
    lat = pipe("x", height=16, width=32, num_inference_steps=1, guidance_scale=1.0,
               key=jax.random.PRNGKey(1), output_type="latent").images
    assert lat.shape == (1, 4, 8, 16)


def get_dummy_v2w_pipeline():
    from diffusers_tpu.pipelines.cosmos.pipeline_cosmos2_video2world import Cosmos2VideoToWorldPipeline

    key = jax.random.PRNGKey(0)
    transformer = CosmosTransformer3DModel(
        in_channels=5,  # 4 latents + 1 condition mask channel
        out_channels=4,
        num_attention_heads=2,
        attention_head_dim=12,
        num_layers=2,
        mlp_ratio=2.0,
        text_embed_dim=16,
        adaln_lora_dim=8,
        max_size=(16, 32, 32),
        patch_size=(1, 2, 2),
        rope_scale=(1.0, 1.0, 1.0),
        concat_padding_mask=True,
    )
    vae = AutoencoderKLWan(
        base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1, attn_scales=[],
        temperal_downsample=[True],
        latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
        scale_factor_temporal=2, scale_factor_spatial=2,
    )
    t5 = T5EncoderModel(vocab_size=512, d_model=16, d_kv=8, d_ff=32, num_layers=1, num_heads=2,
                        feed_forward_proj="gated-gelu")
    scheduler = FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=False, shift=1.0)
    return Cosmos2VideoToWorldPipeline(
        text_encoder=(t5, t5.init_params(key)),
        tokenizer=DummyTokenizer(),
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)),
        scheduler=scheduler,
    )


def test_cosmos2_video2world_from_image():
    pipe = get_dummy_v2w_pipeline()
    image = np.random.RandomState(0).rand(1, 3, 16, 32).astype(np.float32) * 2 - 1
    out = pipe("a drone flyover", image=image, height=16, width=32, num_frames=5,
               num_inference_steps=2, guidance_scale=7.0,
               key=jax.random.PRNGKey(0), output_type="np")
    # latent frames (5-1)/2+1 = 3 -> decoded 1 + 2*(3-1) = 5
    assert out.frames.shape == (1, 5, 16, 32, 3)
    assert np.isfinite(out.frames).all()


def test_cosmos2_video2world_from_video():
    pipe = get_dummy_v2w_pipeline()
    video = np.random.RandomState(1).rand(1, 3, 3, 16, 32).astype(np.float32) * 2 - 1
    lat = pipe("x", video=video, height=16, width=32, num_frames=5, num_inference_steps=1,
               guidance_scale=1.0, key=jax.random.PRNGKey(1), output_type="latent").frames
    assert lat.shape == (1, 4, 3, 8, 16)
