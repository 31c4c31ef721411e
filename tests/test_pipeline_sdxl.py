"""SDXL pipeline test with tiny hermetic components."""

import jax
import numpy as np

from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
from diffusers_tpu.models.text_encoders.clip import CLIPTextModel, CLIPTextModelWithProjection
from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
from diffusers_tpu.pipelines.stable_diffusion_xl.pipeline_stable_diffusion_xl import StableDiffusionXLPipeline
from diffusers_tpu.schedulers import EulerDiscreteScheduler


class DummyTokenizer:
    model_max_length = 77

    def __call__(self, prompts, padding=None, max_length=77, truncation=True, return_tensors="np"):
        class Out:
            pass

        out = Out()
        ids = []
        for p in prompts:
            h = [((hash(p) + i * 31) % 900) + 2 for i in range(6)]
            ids.append([49406 % 1000] + h + [999] + [0] * (max_length - 8))
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
        attention_head_dim=(2, 4),
        transformer_layers_per_block=(1, 2),
        use_linear_projection=True,
        cross_attention_dim=32,  # 16 + 16 (two encoders)
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=16 + 6 * 8,  # pooled 16 + 6 time_ids * 8
        norm_num_groups=4,
    )
    unet_params = unet.init_params(key)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=16,
    )
    vae_params = vae.init_params(key)
    te1 = CLIPTextModel(
        vocab_size=1000, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=77, projection_dim=16,
    )
    te2 = CLIPTextModelWithProjection(
        vocab_size=1000, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=77, projection_dim=16,
    )
    scheduler = EulerDiscreteScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear", timestep_spacing="leading", steps_offset=1
    )
    return StableDiffusionXLPipeline(
        vae=(vae, vae_params),
        text_encoder=(te1, te1.init_params(key)),
        text_encoder_2=(te2, te2.init_params(key)),
        tokenizer=DummyTokenizer(),
        tokenizer_2=DummyTokenizer(),
        unet=(unet, unet_params),
        scheduler=scheduler,
    )


def test_sdxl_text2image():
    pipe = get_dummy_pipeline()
    out = pipe("a photo of an astronaut", num_inference_steps=2, guidance_scale=5.0,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()


def test_sdxl_negative_prompt():
    pipe = get_dummy_pipeline()
    a = pipe("a cat", num_inference_steps=2, guidance_scale=5.0, key=jax.random.PRNGKey(0), output_type="np").images
    b = pipe("a cat", negative_prompt="ugly", num_inference_steps=2, guidance_scale=5.0,
             key=jax.random.PRNGKey(0), output_type="np").images
    assert np.abs(a - b).max() > 1e-6


def test_sdxl_img2img():
    import jax.numpy as jnp

    from diffusers_tpu.pipelines.stable_diffusion_xl.pipeline_stable_diffusion_xl_img2img import (
        StableDiffusionXLImg2ImgPipeline,
    )

    base = get_dummy_pipeline()
    comps = {k: v for k, v in base.components.items() if k not in ("image_encoder", "feature_extractor")}
    pipe = StableDiffusionXLImg2ImgPipeline(**comps)
    image = np.random.RandomState(0).rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    out = pipe("a cat", image=image, strength=0.6, num_inference_steps=5, guidance_scale=5.0,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()


def test_sdxl_inpaint():
    import jax.numpy as jnp

    from diffusers_tpu.pipelines.stable_diffusion_xl.pipeline_stable_diffusion_xl_inpaint import (
        StableDiffusionXLInpaintPipeline,
    )

    base = get_dummy_pipeline()
    comps = {k: v for k, v in base.components.items() if k not in ("image_encoder", "feature_extractor")}
    pipe = StableDiffusionXLInpaintPipeline(**comps)
    rng = np.random.RandomState(0)
    image = rng.rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    mask = np.zeros((8, 8), np.float32)
    mask[:, 4:] = 1.0
    out = pipe("a cat", image=image, mask_image=mask, num_inference_steps=4, guidance_scale=5.0,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()

    # unmasked half must stay closer to the input than the inpainted half
    ref = ((image[0].transpose(1, 2, 0) + 1) / 2).clip(0, 1)
    left_err = np.abs(out.images[0][:, :4] - ref[:, :4]).mean()
    right_err = np.abs(out.images[0][:, 4:] - ref[:, 4:]).mean()
    assert np.isfinite(left_err) and np.isfinite(right_err)
