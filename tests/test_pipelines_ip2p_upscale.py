"""InstructPix2Pix + x4 upscaler pipelines (hermetic tiny components)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusers_tpu import StableDiffusionInstructPix2PixPipeline, StableDiffusionUpscalePipeline
from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
from diffusers_tpu.models.text_encoders.clip import CLIPTextModel
from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
from diffusers_tpu.schedulers import DDIMScheduler, DDPMScheduler
from tests.test_pipeline_stable_diffusion import DummyTokenizer


def _small_components(in_channels, num_class_embeds=None):
    key = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(
        sample_size=8, in_channels=in_channels, out_channels=4,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(8, 16), layers_per_block=1, attention_head_dim=2,
        cross_attention_dim=16, norm_num_groups=4, num_class_embeds=num_class_embeds,
    )
    unet_params = unet.init_params(key)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=16,
    )
    vae_params = vae.init_params(key)
    te = CLIPTextModel(vocab_size=1000, hidden_size=16, intermediate_size=32,
                       num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=77)
    te_params = te.init_params(key)
    sched = DDIMScheduler(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
                          clip_sample=False, set_alpha_to_one=False, steps_offset=1)
    return (vae, vae_params), (te, te_params), (unet, unet_params), sched


def test_instruct_pix2pix_runs_and_guides():
    vae, te, unet, sched = _small_components(in_channels=8)
    pipe = StableDiffusionInstructPix2PixPipeline(
        vae=vae, text_encoder=te, tokenizer=DummyTokenizer(), unet=unet, scheduler=sched,
    )
    image = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    out = pipe(prompt="make it snow", image=image, num_inference_steps=2,
               guidance_scale=6.0, image_guidance_scale=1.5,
               key=jax.random.PRNGKey(1), output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    # 3-way CFG differs from no-CFG
    out2 = pipe(prompt="make it snow", image=image, num_inference_steps=2,
                guidance_scale=1.0, image_guidance_scale=0.5,
                key=jax.random.PRNGKey(1), output_type="np")
    assert not np.allclose(out.images, out2.images)


def test_instruct_pix2pix_image_latents_use_mode():
    vae, te, unet, sched = _small_components(in_channels=8)
    pipe = StableDiffusionInstructPix2PixPipeline(
        vae=vae, text_encoder=te, tokenizer=DummyTokenizer(), unet=unet, scheduler=sched,
    )
    image = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    # identical keys → identical outputs (mode() is deterministic; a sampled
    # image latent would inject key-dependent noise outside our control)
    a = pipe(prompt="p", image=image, num_inference_steps=2, key=jax.random.PRNGKey(2), output_type="latent").images
    b = pipe(prompt="p", image=image, num_inference_steps=2, key=jax.random.PRNGKey(2), output_type="latent").images
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_upscale_pipeline_4x_output():
    vae, te, unet, sched = _small_components(in_channels=7, num_class_embeds=1000)
    low_res_scheduler = DDPMScheduler(num_train_timesteps=1000)
    pipe = StableDiffusionUpscalePipeline(
        vae=vae, text_encoder=te, tokenizer=DummyTokenizer(), unet=unet,
        low_res_scheduler=low_res_scheduler, scheduler=sched,
    )
    low_res = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
    out = pipe(prompt="a sharp photo", image=low_res, num_inference_steps=2,
               guidance_scale=7.0, noise_level=20, key=jax.random.PRNGKey(0), output_type="np")
    # latent res == low-res image res; tiny VAE upsamples 2^(len(blocks)-1)=1x...
    # with one block the decode keeps 8x8; what matters: it runs + channel plumbing
    assert out.images.shape[0] == 1 and out.images.shape[-1] == 3
    assert out.images.min() >= 0 and out.images.max() <= 1
