"""Marigold depth/normals pipeline smokes + ensemble unit checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
from diffusers_tpu.models.text_encoders.clip import CLIPTextModel
from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
from diffusers_tpu.pipelines.marigold import MarigoldDepthPipeline, MarigoldNormalsPipeline
from diffusers_tpu.schedulers.scheduling_ddim import DDIMScheduler


class Tok:
    model_max_length = 7

    def __call__(self, prompts, padding=None, max_length=7, truncation=True, return_tensors="np"):
        class Out:
            pass

        o = Out()
        o.input_ids = np.array([[2, 3, 4]] * len(prompts))
        o.attention_mask = np.ones_like(o.input_ids)
        return o


def _components(key):
    unet = UNet2DConditionModel(
        in_channels=8, out_channels=4,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=4, norm_num_groups=16,
    )
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, block_out_channels=(32, 32),
        layers_per_block=1, latent_channels=4, norm_num_groups=32, scaling_factor=0.18,
    )
    te = CLIPTextModel(
        vocab_size=50, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=77,
    )
    return (
        (unet, unet.init_params(key)),
        (vae, vae.init_params(key)),
        (te, te.init_params(key)),
    )


def test_marigold_depth_smoke():
    key = jax.random.PRNGKey(0)
    unet, vae, te = _components(key)
    pipe = MarigoldDepthPipeline(
        unet=unet, vae=vae, scheduler=DDIMScheduler(), text_encoder=te, tokenizer=Tok(),
        default_denoising_steps=2, default_processing_resolution=16,
    )
    img = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
    out = pipe(img, ensemble_size=1, output_type="np")
    assert out.prediction.shape == (1, 32, 32, 1)
    assert np.isfinite(out.prediction).all()
    assert out.prediction.min() >= 0.0 and out.prediction.max() <= 1.0


def test_marigold_depth_ensemble():
    pytest.importorskip("scipy")
    key = jax.random.PRNGKey(1)
    unet, vae, te = _components(key)
    pipe = MarigoldDepthPipeline(
        unet=unet, vae=vae, scheduler=DDIMScheduler(), text_encoder=te, tokenizer=Tok(),
        default_denoising_steps=2, default_processing_resolution=16,
    )
    img = np.random.RandomState(1).rand(16, 16, 3).astype(np.float32)
    out = pipe(img, ensemble_size=3, output_uncertainty=True, output_type="np")
    assert out.prediction.shape == (1, 16, 16, 1)
    assert out.uncertainty.shape == (1, 16, 16, 1)
    assert np.isfinite(out.prediction).all() and np.isfinite(out.uncertainty).all()


def test_marigold_normals_smoke():
    key = jax.random.PRNGKey(2)
    unet, vae, te = _components(key)
    pipe = MarigoldNormalsPipeline(
        unet=unet, vae=vae, scheduler=DDIMScheduler(), text_encoder=te, tokenizer=Tok(),
        default_denoising_steps=2, default_processing_resolution=16,
    )
    img = np.random.RandomState(2).rand(16, 16, 3).astype(np.float32)
    out = pipe(img, ensemble_size=2, output_type="np")
    assert out.prediction.shape == (1, 16, 16, 3)
    assert np.isfinite(out.prediction).all()
    norms = np.linalg.norm(out.prediction, axis=-1)
    # ensembled "closest" normals are unit vectors up to output resampling
    assert np.allclose(norms, 1.0, atol=1e-3)


def test_ensemble_normals_closest_picks_member():
    rng = np.random.RandomState(3)
    normals = rng.randn(3, 3, 4, 4).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    pred, unc = MarigoldNormalsPipeline.ensemble_normals(jnp.asarray(normals), True)
    pred = np.asarray(pred)
    assert pred.shape == (1, 3, 4, 4)
    # every output pixel equals one of the ensemble members' pixels
    stacked = np.transpose(normals, (0, 2, 3, 1)).reshape(3, -1, 3)
    out = np.transpose(pred[0], (1, 2, 0)).reshape(-1, 3)
    for p in range(out.shape[0]):
        assert min(np.abs(out[p] - stacked[m, p]).max() for m in range(3)) < 1e-6
    assert np.asarray(unc).shape == (1, 1, 4, 4)
