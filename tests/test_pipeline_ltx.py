"""LTX text-to-video pipeline test with tiny hermetic components (reference
strategy: `tests/pipelines/ltx/test_ltx.py` get_dummy_components)."""

import jax
import numpy as np

from diffusers_tpu.models.autoencoders.autoencoder_kl_ltx import AutoencoderKLLTXVideo
from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
from diffusers_tpu.models.transformers.transformer_ltx import LTXVideoTransformer3DModel
from diffusers_tpu.pipelines.ltx.pipeline_ltx import LTXPipeline
from diffusers_tpu.schedulers import FlowMatchEulerDiscreteScheduler

from tests.test_pipeline_wan import DummyTokenizer


def get_dummy_pipeline(timestep_conditioning=False):
    key = jax.random.PRNGKey(0)
    transformer = LTXVideoTransformer3DModel(
        in_channels=8,
        out_channels=8,
        patch_size=1,
        patch_size_t=1,
        num_attention_heads=2,
        attention_head_dim=12,
        cross_attention_dim=24,
        num_layers=1,
        caption_channels=16,
    )
    vae = AutoencoderKLLTXVideo(
        in_channels=3,
        out_channels=3,
        latent_channels=8,
        block_out_channels=(8, 8, 8, 8),
        decoder_block_out_channels=(8, 8, 8, 8),
        layers_per_block=(1, 1, 1, 1, 1),
        decoder_layers_per_block=(1, 1, 1, 1, 1),
        spatio_temporal_scaling=(True, True, False, False),
        decoder_spatio_temporal_scaling=(True, True, False, False),
        timestep_conditioning=timestep_conditioning,
        patch_size=1,
        patch_size_t=1,
    )
    t5 = T5EncoderModel(vocab_size=512, d_model=16, d_kv=8, d_ff=32, num_layers=1, num_heads=2,
                        feed_forward_proj="gated-gelu")
    scheduler = FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True, base_shift=0.5, max_shift=1.15,
                                                base_image_seq_len=256, max_image_seq_len=4096)
    return LTXPipeline(
        scheduler=scheduler,
        vae=(vae, vae.init_params(key)),
        text_encoder=(t5, t5.init_params(key)),
        tokenizer=DummyTokenizer(),
        transformer=(transformer, transformer.init_params(key)),
    )


def test_ltx_text2video():
    pipe = get_dummy_pipeline()
    out = pipe(
        "a river of stars",
        height=16,
        width=16,
        num_frames=5,
        num_inference_steps=2,
        guidance_scale=3.0,
        output_type="np",
        key=jax.random.PRNGKey(0),
    ).frames
    # spatial ratio 1*2^2=4, temporal 1*2^2=4 → latent 2 frames 4x4 → video 5@16x16
    assert out.shape == (1, 5, 16, 16, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_ltx_latent_output_and_cfg_off():
    pipe = get_dummy_pipeline()
    lat = pipe(
        "x", height=16, width=16, num_frames=5, num_inference_steps=1,
        guidance_scale=1.0, output_type="latent", key=jax.random.PRNGKey(1),
    ).frames
    assert lat.shape == (1, 2 * 4 * 4, 8)


def test_ltx_timestep_conditioned_decode():
    pipe = get_dummy_pipeline(timestep_conditioning=True)
    out = pipe(
        "y", height=16, width=16, num_frames=5, num_inference_steps=1,
        guidance_scale=1.0, decode_timestep=0.05, output_type="np",
        key=jax.random.PRNGKey(2),
    ).frames
    assert out.shape == (1, 5, 16, 16, 3)
    assert np.isfinite(out).all()
