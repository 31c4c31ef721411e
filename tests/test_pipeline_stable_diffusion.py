"""StableDiffusionPipeline tests: hermetic tiny components, full 2-step
generation (reference strategy: `tests/pipelines/stable_diffusion/test_stable_diffusion.py`
get_dummy_components)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
from diffusers_tpu.models.text_encoders.clip import CLIPTextModel
from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
from diffusers_tpu.pipelines.stable_diffusion.pipeline_stable_diffusion import StableDiffusionPipeline
from diffusers_tpu.schedulers import DDIMScheduler


class DummyTokenizer:
    model_max_length = 77

    def __call__(self, prompts, padding=None, max_length=16, truncation=True, return_tensors="np"):
        class Out:
            pass

        out = Out()
        ids = []
        for p in prompts:
            h = [((hash(p) + i * 31) % 900) + 2 for i in range(8)]
            ids.append([49406 % 1000] + h + [2] + [0] * 6)
        out.input_ids = np.array(ids) % 1000
        return out

    def save_pretrained(self, path):
        pass


def get_dummy_pipeline():
    key = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(
        sample_size=8,
        in_channels=4,
        out_channels=4,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(8, 16),
        layers_per_block=1,
        attention_head_dim=2,
        cross_attention_dim=16,
        norm_num_groups=4,
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
    return StableDiffusionPipeline(
        vae=(vae, vae_params),
        text_encoder=(te, te_params),
        tokenizer=DummyTokenizer(),
        unet=(unet, unet_params),
        scheduler=scheduler,
    )


def test_text2image_shapes():
    pipe = get_dummy_pipeline()
    out = pipe("a photo of a cat", num_inference_steps=2, guidance_scale=6.0,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()


def test_cfg_changes_output():
    pipe = get_dummy_pipeline()
    a = pipe("a cat", num_inference_steps=2, guidance_scale=1.0, key=jax.random.PRNGKey(0), output_type="np").images
    b = pipe("a cat", num_inference_steps=2, guidance_scale=7.5, key=jax.random.PRNGKey(0), output_type="np").images
    assert np.abs(a - b).max() > 1e-6


def test_negative_prompt_changes_output():
    pipe = get_dummy_pipeline()
    a = pipe("a cat", num_inference_steps=2, guidance_scale=6.0, key=jax.random.PRNGKey(0), output_type="np").images
    b = pipe("a cat", negative_prompt="blurry", num_inference_steps=2, guidance_scale=6.0,
             key=jax.random.PRNGKey(0), output_type="np").images
    assert np.abs(a - b).max() > 1e-6


def test_latent_output_and_batching():
    pipe = get_dummy_pipeline()
    out = pipe(["a cat", "a dog"], num_inference_steps=2, guidance_scale=6.0,
               key=jax.random.PRNGKey(1), output_type="latent", return_dict=False)[0]
    assert out.shape == (2, 4, 8, 8)


def test_callback_on_step_end_cfg_cutoff():
    from diffusers_tpu.callbacks import SDCFGCutoffCallback

    pipe = get_dummy_pipeline()
    out = pipe(
        "a cat", num_inference_steps=4, guidance_scale=6.0, key=jax.random.PRNGKey(0),
        output_type="np", callback_on_step_end=SDCFGCutoffCallback(cutoff_step_ratio=0.5),
    )
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()


def test_callback_results_differ_from_no_callback():
    from diffusers_tpu.callbacks import SDCFGCutoffCallback

    pipe = get_dummy_pipeline()
    a = pipe("a cat", num_inference_steps=4, guidance_scale=6.0, key=jax.random.PRNGKey(0), output_type="np").images
    b = pipe("a cat", num_inference_steps=4, guidance_scale=6.0, key=jax.random.PRNGKey(0), output_type="np",
             callback_on_step_end=SDCFGCutoffCallback(cutoff_step_ratio=0.25)).images
    assert np.abs(a - b).max() > 1e-6


def test_latent_consistency_pipeline():
    """LCM pipeline: w-embedding conditioning, no CFG, denoised-output decode."""
    from diffusers_tpu.pipelines.latent_consistency_models import LatentConsistencyModelPipeline
    from diffusers_tpu.schedulers import LCMScheduler

    key = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(
        sample_size=8, in_channels=4, out_channels=4,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(8, 16), layers_per_block=1, attention_head_dim=2,
        cross_attention_dim=16, norm_num_groups=4, time_cond_proj_dim=32,
    )
    unet_params = unet.init_params(key)
    base = __import__("test_pipeline_stable_diffusion").get_dummy_pipeline()
    pipe = LatentConsistencyModelPipeline(
        vae=base.vae, text_encoder=base.text_encoder, tokenizer=base.tokenizer,
        unet=(unet, unet_params),
        scheduler=LCMScheduler(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear"),
    )
    out = pipe("a photo of a cat", num_inference_steps=4, guidance_scale=8.0,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()

    # guidance scale must flow through the w-embedding (different w → different image)
    out2 = pipe("a photo of a cat", num_inference_steps=4, guidance_scale=2.0,
                key=jax.random.PRNGKey(0), output_type="np")
    assert np.abs(out.images - out2.images).max() > 1e-6


def test_tcd_pipeline():
    """TCD pipeline: gamma-stochastic consistency sampling, w-embedding optional."""
    from diffusers_tpu.pipelines.tcd import TCDPipeline
    from diffusers_tpu.schedulers import TCDScheduler

    base = get_dummy_pipeline()
    pipe = TCDPipeline(
        vae=base.vae, text_encoder=base.text_encoder, tokenizer=base.tokenizer,
        unet=base.unet,
        scheduler=TCDScheduler(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear"),
    )
    out = pipe("a photo of a cat", num_inference_steps=4, eta=0.3,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()

    # eta=0 is the deterministic trajectory — different from gamma-stochastic
    det = pipe("a photo of a cat", num_inference_steps=4, eta=0.0,
               key=jax.random.PRNGKey(0), output_type="np")
    assert np.abs(det.images - out.images).max() > 1e-6
