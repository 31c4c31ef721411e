"""aMUSEd pipeline e2e with tiny hermetic components (reference strategy:
tests/pipelines/amused/test_amused.py)."""

import jax
import numpy as np

from diffusers_tpu.models.autoencoders.vq_model import VQModel
from diffusers_tpu.models.text_encoders.clip import CLIPTextModelWithProjection
from diffusers_tpu.models.unets.uvit_2d import UVit2DModel
from diffusers_tpu.pipelines.deprecated.amused import AmusedPipeline
from diffusers_tpu.schedulers.scheduling_amused import AmusedScheduler

from tests.test_pipeline_sdxl import DummyTokenizer


def get_dummy_pipeline():
    key = jax.random.PRNGKey(0)
    transformer = UVit2DModel(
        hidden_size=16, use_bias=False, cond_embed_dim=16, micro_cond_encode_dim=2,
        micro_cond_embed_dim=10, encoder_hidden_size=16, vocab_size=33, codebook_size=32,
        in_channels=8, block_out_channels=8, num_res_blocks=1, downsample=True, upsample=True,
        block_num_heads=2, num_hidden_layers=1, num_attention_heads=2, intermediate_size=16,
        sample_size=4,
    )
    vqvae = VQModel(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=8, num_vq_embeddings=32, norm_num_groups=4, layers_per_block=1,
        lookup_from_codebook=True,
    )
    te = CLIPTextModelWithProjection(
        vocab_size=1000, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=77, projection_dim=16,
    )
    scheduler = AmusedScheduler(mask_token_id=32)
    return AmusedPipeline(
        vqvae=(vqvae, vqvae.init_params(key)),
        tokenizer=DummyTokenizer(),
        text_encoder=(te, te.init_params(key)),
        transformer=(transformer, transformer.init_params(key)),
        scheduler=scheduler,
    )


def test_amused_text2image():
    pipe = get_dummy_pipeline()
    out = pipe("a bird", height=8, width=8, num_inference_steps=2, guidance_scale=10.0,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()


def test_amused_latent_ids():
    pipe = get_dummy_pipeline()
    lat = pipe("x", height=8, width=8, num_inference_steps=2, guidance_scale=1.0,
               key=jax.random.PRNGKey(1), output_type="latent").images
    assert lat.shape == (1, 8, 8)  # vq scale factor 1 with one block
    # all tokens unmasked by the final step
    assert int((np.asarray(lat) == 32).sum()) == 0
