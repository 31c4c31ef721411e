"""img2img / inpaint / SD3 pipeline smoke tests with tiny components."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
from diffusers_tpu.models.text_encoders.clip import CLIPTextModel, CLIPTextModelWithProjection
from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
from diffusers_tpu.models.transformers.transformer_sd3 import SD3Transformer2DModel
from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
from diffusers_tpu.pipelines.stable_diffusion.pipeline_stable_diffusion_img2img import StableDiffusionImg2ImgPipeline
from diffusers_tpu.pipelines.stable_diffusion.pipeline_stable_diffusion_inpaint import StableDiffusionInpaintPipeline
from diffusers_tpu.pipelines.stable_diffusion_3.pipeline_stable_diffusion_3 import StableDiffusion3Pipeline
from diffusers_tpu.schedulers import DDIMScheduler, FlowMatchEulerDiscreteScheduler

from test_pipeline_stable_diffusion import DummyTokenizer, get_dummy_pipeline


def _components():
    pipe = get_dummy_pipeline()
    return pipe.components


def test_img2img():
    comps = _components()
    comps.pop("image_encoder", None)
    pipe = StableDiffusionImg2ImgPipeline(**comps)
    image = np.random.RandomState(0).rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    out = pipe("a cat", image=image, strength=0.8, num_inference_steps=5, guidance_scale=6.0,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()


def test_inpaint_blend():
    comps = _components()
    comps.pop("image_encoder", None)
    pipe = StableDiffusionInpaintPipeline(**comps)
    image = np.random.RandomState(0).rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    mask = np.zeros((8, 8), np.float32)
    mask[2:6, 2:6] = 1.0
    out = pipe("a cat", image=image, mask_image=mask, num_inference_steps=3, guidance_scale=6.0,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()


def get_dummy_sd3_pipeline(cls=StableDiffusion3Pipeline):
    key = jax.random.PRNGKey(0)
    transformer = SD3Transformer2DModel(
        sample_size=8, patch_size=2, in_channels=4, num_layers=1, attention_head_dim=8,
        num_attention_heads=2, joint_attention_dim=32, caption_projection_dim=16,
        pooled_projection_dim=32, out_channels=4, pos_embed_max_size=96,
    )
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,), down_block_types=("DownEncoderBlock2D",),
        up_block_types=("UpDecoderBlock2D",), latent_channels=4, layers_per_block=1,
        norm_num_groups=4, sample_size=8, scaling_factor=1.5, shift_factor=0.06,
    )
    te1 = CLIPTextModelWithProjection(vocab_size=1000, hidden_size=8, intermediate_size=16, num_hidden_layers=1,
                                      num_attention_heads=2, projection_dim=16)
    te2 = CLIPTextModelWithProjection(vocab_size=1000, hidden_size=8, intermediate_size=16, num_hidden_layers=1,
                                      num_attention_heads=2, projection_dim=16)
    t5 = T5EncoderModel(vocab_size=1000, d_model=32, d_kv=8, d_ff=32, num_layers=1, num_heads=2,
                        feed_forward_proj="gated-gelu")
    return cls(
        transformer=(transformer, transformer.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(shift=3.0),
        vae=(vae, vae.init_params(key)),
        text_encoder=(te1, te1.init_params(key)),
        tokenizer=DummyTokenizer(),
        text_encoder_2=(te2, te2.init_params(key)),
        tokenizer_2=DummyTokenizer(),
        text_encoder_3=(t5, t5.init_params(key)),
        tokenizer_3=DummyTokenizer(),
    )


def test_sd3_pipeline():
    key = jax.random.PRNGKey(0)
    pipe = get_dummy_sd3_pipeline()
    out = pipe("a painting", height=8, width=8, num_inference_steps=2, guidance_scale=5.0,
               max_sequence_length=16, key=key, output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()


def test_sd3_img2img():
    from diffusers_tpu.pipelines.stable_diffusion_3.pipeline_stable_diffusion_3_img2img import (
        StableDiffusion3Img2ImgPipeline,
    )

    pipe = get_dummy_sd3_pipeline(StableDiffusion3Img2ImgPipeline)
    image = np.random.RandomState(0).rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    out = pipe("a cat", image=image, strength=0.8, num_inference_steps=4, guidance_scale=6.0,
               max_sequence_length=16, key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()


def test_sd3_img2img_strength_truncates():
    from diffusers_tpu.pipelines.stable_diffusion_3.pipeline_stable_diffusion_3_img2img import (
        StableDiffusion3Img2ImgPipeline,
    )

    pipe = get_dummy_sd3_pipeline(StableDiffusion3Img2ImgPipeline)
    state = pipe.scheduler.set_timesteps(10)
    ts = pipe.get_timesteps(state, 10, 0.3)
    assert ts.shape[0] == 3


def test_sd3_inpaint_blend():
    from diffusers_tpu.pipelines.stable_diffusion_3.pipeline_stable_diffusion_3_inpaint import (
        StableDiffusion3InpaintPipeline,
    )

    pipe = get_dummy_sd3_pipeline(StableDiffusion3InpaintPipeline)
    image = np.random.RandomState(0).rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    mask = np.zeros((8, 8), np.float32)
    mask[2:6, 2:6] = 1.0
    out = pipe("a cat", image=image, mask_image=mask, strength=1.0, num_inference_steps=3,
               guidance_scale=6.0, max_sequence_length=16,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()
