"""PixArt-Alpha / Sigma pipeline tests with tiny hermetic components."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
from diffusers_tpu.models.transformers.pixart_transformer_2d import PixArtTransformer2DModel
from diffusers_tpu.pipelines.pixart_alpha.pipeline_pixart_alpha import (
    PixArtAlphaPipeline,
    PixArtSigmaPipeline,
)
from diffusers_tpu.schedulers import DPMSolverMultistepScheduler


class DummyT5Tokenizer:
    model_max_length = 120

    def __call__(self, prompts, padding=None, max_length=16, truncation=True, return_tensors="np"):
        class Out:
            pass

        out = Out()
        ids, masks = [], []
        for p in prompts:
            toks = [((hash(p) + i * 17) % 900) + 2 for i in range(min(6, max_length))]
            pad = max_length - len(toks) - 1
            ids.append(toks + [1] + [0] * pad)
            masks.append([1] * (len(toks) + 1) + [0] * pad)
        out.input_ids = np.array(ids)
        out.attention_mask = np.array(masks)
        return out

    def save_pretrained(self, path):
        pass


def get_dummy_pipeline(cls=PixArtAlphaPipeline, use_additional_conditions=False):
    key = jax.random.PRNGKey(0)
    # 3 heads: micro-conditions need inner_dim divisible by 3 (size_emb_dim = dim//3)
    transformer = PixArtTransformer2DModel(
        num_attention_heads=3, attention_head_dim=8, in_channels=4, out_channels=8,
        num_layers=2, cross_attention_dim=24, sample_size=8, patch_size=2,
        caption_channels=24, use_additional_conditions=use_additional_conditions,
    )
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,), down_block_types=("DownEncoderBlock2D",),
        up_block_types=("UpDecoderBlock2D",), latent_channels=4, layers_per_block=1,
        norm_num_groups=4, sample_size=8, scaling_factor=0.18,
    )
    t5 = T5EncoderModel(vocab_size=1000, d_model=24, d_kv=8, d_ff=48, num_layers=1, num_heads=3,
                        feed_forward_proj="gated-gelu")
    scheduler = DPMSolverMultistepScheduler()
    return cls(
        tokenizer=DummyT5Tokenizer(),
        text_encoder=(t5, t5.init_params(key)),
        vae=(vae, vae.init_params(key)),
        transformer=(transformer, transformer.init_params(key)),
        scheduler=scheduler,
    )


def test_pixart_alpha_text2image():
    pipe = get_dummy_pipeline()
    out = pipe("a watercolor fox", height=8, width=8, num_inference_steps=2, guidance_scale=4.5,
               use_resolution_binning=False, key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()


def test_pixart_alpha_micro_conditions():
    pipe = get_dummy_pipeline(use_additional_conditions=True)
    out = pipe("a watercolor fox", height=8, width=8, num_inference_steps=2, guidance_scale=4.5,
               use_resolution_binning=False, key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()


def test_pixart_sigma_and_negative_prompt():
    pipe = get_dummy_pipeline(PixArtSigmaPipeline)
    a = pipe("a fox", height=8, width=8, num_inference_steps=2, guidance_scale=4.5,
             use_resolution_binning=False, key=jax.random.PRNGKey(0), output_type="np").images
    b = pipe("a fox", negative_prompt="blurry", height=8, width=8, num_inference_steps=2,
             guidance_scale=4.5, use_resolution_binning=False, key=jax.random.PRNGKey(0),
             output_type="np").images
    assert np.abs(a - b).max() > 1e-6


def test_pixart_resolution_binning_helpers():
    from diffusers_tpu.image_processor import VaeImageProcessor
    from diffusers_tpu.pipelines.pixart_alpha.pipeline_pixart_alpha import ASPECT_RATIO_1024_BIN

    h, w = VaeImageProcessor.classify_height_width_bin(1000, 1000, ASPECT_RATIO_1024_BIN)
    assert (h, w) == (1024, 1024)
    h, w = VaeImageProcessor.classify_height_width_bin(512, 2000, ASPECT_RATIO_1024_BIN)
    assert (h, w) == (512, 2048)

    imgs = jnp.ones((1, 3, 8, 12))
    out = VaeImageProcessor.resize_and_crop_tensor(imgs, 10, 8)
    assert out.shape == (1, 3, 8, 10)
