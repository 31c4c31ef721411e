"""PAG variant pipelines (round 4): img2img/inpaint/SDXL/Kolors/HunyuanDiT/
Sana/ControlNet wrappers over the shared PAGMixin (pipelines/pag/pag_utils.py).

Strategy mirrors the reference PAG tests
(`tests/pipelines/pag/test_pag_*.py`): tiny hermetic components, assert the
perturbed term changes the output (pag_scale 0 vs >0) and stays finite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _differs(a, b):
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) > 1e-6


# ------------------------------------------------------------------ SD family
def _sd_images(pipe_cls, **call_kwargs):
    from test_pipeline_stable_diffusion import get_dummy_pipeline

    base = get_dummy_pipeline()
    comps = {k: v for k, v in base.components.items()
             if k in ("vae", "text_encoder", "tokenizer", "unet", "scheduler")}
    pipe = pipe_cls(**comps)
    outs = []
    for pag_scale in (0.0, 2.0):
        out = pipe("a cat", num_inference_steps=2, guidance_scale=6.0,
                   pag_scale=pag_scale, pag_applied_layers="attn1",
                   key=jax.random.PRNGKey(0), output_type="np", **call_kwargs).images
        assert np.isfinite(out).all()
        outs.append(out)
    return outs


def test_pag_sd_img2img():
    from diffusers_tpu.pipelines.pag.pipeline_pag_sd_img2img import StableDiffusionPAGImg2ImgPipeline

    img = np.random.RandomState(0).rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    off, on = _sd_images(StableDiffusionPAGImg2ImgPipeline, image=jnp.asarray(img), strength=0.9)
    assert off.shape == (1, 8, 8, 3) and _differs(off, on)


def test_pag_sd_inpaint():
    from diffusers_tpu.pipelines.pag.pipeline_pag_sd_inpaint import StableDiffusionPAGInpaintPipeline

    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    mask = np.zeros((8, 8), np.float32)
    mask[2:6, 2:6] = 1.0
    off, on = _sd_images(StableDiffusionPAGInpaintPipeline, image=jnp.asarray(img), mask_image=mask)
    assert off.shape == (1, 8, 8, 3) and _differs(off, on)


# ---------------------------------------------------------------- SDXL family
def _sdxl_pipe(pipe_cls):
    from test_pipeline_sdxl import get_dummy_pipeline

    base = get_dummy_pipeline()
    comps = {k: v for k, v in base.components.items()
             if k not in ("image_encoder", "feature_extractor")}
    return pipe_cls(**comps)


def test_pag_sdxl_img2img():
    from diffusers_tpu.pipelines.pag.pipeline_pag_sd_xl_img2img import StableDiffusionXLPAGImg2ImgPipeline

    pipe = _sdxl_pipe(StableDiffusionXLPAGImg2ImgPipeline)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 3, 16, 16).astype(np.float32) * 2 - 1)
    outs = []
    for pag_scale in (0.0, 2.0):
        out = pipe("a bird", image=img, strength=0.9, num_inference_steps=2,
                   guidance_scale=5.0, pag_scale=pag_scale, pag_applied_layers="attn1",
                   key=jax.random.PRNGKey(0), output_type="np").images
        assert np.isfinite(out).all()
        outs.append(out)
    assert _differs(*outs)


def test_pag_sdxl_inpaint():
    from diffusers_tpu.pipelines.pag.pipeline_pag_sd_xl_inpaint import StableDiffusionXLPAGInpaintPipeline

    pipe = _sdxl_pipe(StableDiffusionXLPAGInpaintPipeline)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1)
    mask = np.zeros((16, 16), np.float32)
    mask[4:12, 4:12] = 1.0
    out = pipe("a bird", image=img, mask_image=mask, num_inference_steps=2,
               guidance_scale=5.0, pag_scale=2.0, pag_applied_layers="attn1",
               key=jax.random.PRNGKey(0), output_type="np").images
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(out).all()


# -------------------------------------------------------------------- Kolors
def test_pag_kolors():
    from test_kolors import GLM_KWARGS

    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
    from diffusers_tpu.pipelines.kolors import ChatGLMModel
    from diffusers_tpu.pipelines.pag.pipeline_pag_kolors import KolorsPAGPipeline
    from diffusers_tpu.schedulers.scheduling_euler_discrete import EulerDiscreteScheduler

    key = jax.random.PRNGKey(0)
    te = ChatGLMModel(**GLM_KWARGS)
    unet = UNet2DConditionModel(
        sample_size=8, in_channels=4, out_channels=4,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=16,
        cross_attention_dim=40, attention_head_dim=4,
        encoder_hid_dim=32, encoder_hid_dim_type="text_proj",
        addition_embed_type="text_time", addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=32 + 6 * 8,
    )
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, block_out_channels=(32, 32),
        layers_per_block=1, latent_channels=4, norm_num_groups=32, scaling_factor=0.13,
    )

    class Tok:
        model_max_length = 16

        def __call__(self, prompts, padding=None, max_length=16, truncation=True, return_tensors="np"):
            class Out:
                pass

            o = Out()
            ids, masks = [], []
            for p in prompts:
                n = len(p) % 4 + 2
                ids.append([((hash(p) + i) % 50) + 2 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = KolorsPAGPipeline(
        vae=(vae, vae.init_params(key)), text_encoder=(te, te.init_params(key)),
        tokenizer=Tok(), unet=(unet, unet.init_params(key)),
        scheduler=EulerDiscreteScheduler(),
    )
    out = pipe("a watercolor fox", height=16, width=16, num_inference_steps=2,
               guidance_scale=5.0, pag_scale=2.0, pag_applied_layers="attn1",
               key=key, max_sequence_length=16, output_type="np").images
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(out).all()


# ---------------------------------------------------------------- HunyuanDiT
def test_pag_hunyuandit():
    from test_hunyuandit import TINY, HunyuanDiT2DModel

    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.pipelines.pag.pipeline_pag_hunyuandit import HunyuanDiTPAGPipeline
    from diffusers_tpu.schedulers.scheduling_ddpm import DDPMScheduler

    key = jax.random.PRNGKey(0)
    transformer = HunyuanDiT2DModel(**TINY)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=16,
    )

    class DummyEnc:
        def __init__(self, dim):
            self.dim = dim

        def __call__(self, params, ids, attention_mask=None):
            class Out:
                pass

            o = Out()
            rng = np.random.RandomState(int(np.asarray(ids).sum()) % 1000)
            o.last_hidden_state = jnp.asarray(rng.randn(ids.shape[0], ids.shape[1], self.dim).astype(np.float32))
            return o

    class Tok:
        def __call__(self, prompts, padding=None, max_length=8, truncation=True, return_tensors="np"):
            class Out:
                pass

            o = Out()
            ids, masks = [], []
            for p in prompts:
                n = len(p) % 3 + 2
                ids.append([((hash(p) + i) % 50) + 1 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = HunyuanDiTPAGPipeline(
        vae=(vae, vae.init_params(key)),
        text_encoder=(DummyEnc(16), {}),
        tokenizer=Tok(),
        transformer=(transformer, transformer.init_params(key)),
        scheduler=DDPMScheduler(),
        text_encoder_2=(DummyEnc(16), {}),
        tokenizer_2=Tok(),
    )
    out = pipe("mountain shrine at dusk", height=16, width=16, num_inference_steps=2,
               guidance_scale=5.0, pag_scale=2.0, pag_applied_layers="blocks",
               key=key, output_type="np").images
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(out).all()


# ---------------------------------------------------------------------- Sana
def test_pag_sana():
    from diffusers_tpu.models.autoencoders.autoencoder_dc import AutoencoderDC
    from diffusers_tpu.models.transformers.sana_transformer import SanaTransformer2DModel
    from diffusers_tpu.pipelines.pag.pipeline_pag_sana import SanaPAGPipeline
    from diffusers_tpu.schedulers import FlowMatchEulerDiscreteScheduler

    key = jax.random.PRNGKey(0)
    transformer = SanaTransformer2DModel(
        in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=8,
        num_layers=1, num_cross_attention_heads=2, cross_attention_head_dim=8,
        cross_attention_dim=16, caption_channels=12, mlp_ratio=2.0, sample_size=4, patch_size=1,
    )
    vae = AutoencoderDC(
        in_channels=3, latent_channels=4, attention_head_dim=8,
        encoder_block_types="ResBlock", decoder_block_types="ResBlock",
        encoder_block_out_channels=(8, 8), decoder_block_out_channels=(8, 8),
        encoder_layers_per_block=(1, 1), decoder_layers_per_block=(1, 1),
        encoder_qkv_multiscales=((), ()), decoder_qkv_multiscales=((), ()),
    )
    pipe = SanaPAGPipeline(
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(shift=3.0),
    )
    rng = np.random.RandomState(0)
    embeds = jnp.asarray(rng.randn(2, 6, 12).astype(np.float32))
    mask = jnp.ones((2, 6), dtype=jnp.int32)
    outs = []
    for pag_scale in (0.0, 2.0):
        out = pipe(prompt_embeds=embeds, prompt_attention_mask=mask, height=8, width=8,
                   num_inference_steps=2, guidance_scale=4.0, pag_scale=pag_scale,
                   pag_applied_layers="transformer_blocks",
                   key=jax.random.PRNGKey(0), output_type="np").images
        assert np.isfinite(out).all()
        outs.append(out)
    assert _differs(*outs)


# ----------------------------------------------------------------- ControlNet
def test_pag_controlnet_sd():
    from test_controlnet import _tiny_cn

    from diffusers_tpu.pipelines.pag.pipeline_pag_controlnet_sd import StableDiffusionControlNetPAGPipeline
    from test_pipeline_stable_diffusion import get_dummy_pipeline

    base = get_dummy_pipeline()
    cn, cn_params = _tiny_cn(1)
    comps = {k: v for k, v in base.components.items()
             if k in ("vae", "text_encoder", "tokenizer", "unet", "scheduler")}
    pipe = StableDiffusionControlNetPAGPipeline(controlnet=(cn, cn_params), **comps)
    cond = np.random.RandomState(0).rand(1, 3, 16, 16).astype(np.float32)
    out = pipe("a bird", image=cond, height=8, width=8, num_inference_steps=2,
               guidance_scale=6.0, pag_scale=2.0, pag_applied_layers="attn1",
               key=jax.random.PRNGKey(0), output_type="np").images
    assert out.shape == (1, 8, 8, 3)
    assert np.isfinite(out).all()


def test_pag_controlnet_sdxl():
    from diffusers_tpu.models.controlnets.controlnet import ControlNetModel
    from diffusers_tpu.pipelines.pag.pipeline_pag_controlnet_sd_xl import (
        StableDiffusionXLControlNetPAGPipeline,
    )
    from test_pipeline_sdxl import get_dummy_pipeline

    base = get_dummy_pipeline()
    cn = ControlNetModel(
        in_channels=4,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        block_out_channels=(8, 16),
        layers_per_block=1,
        attention_head_dim=(2, 4),
        transformer_layers_per_block=(1, 2),
        use_linear_projection=True,
        cross_attention_dim=32,
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=16 + 6 * 8,
        norm_num_groups=4,
        conditioning_embedding_out_channels=(8, 16),
    )
    cn_params = cn.init_params(jax.random.PRNGKey(1))
    comps = {k: v for k, v in base.components.items() if k not in ("image_encoder", "feature_extractor")}
    pipe = StableDiffusionXLControlNetPAGPipeline(controlnet=(cn, cn_params), **comps)
    cond = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    out = pipe("a bird", image=cond, height=16, width=16, num_inference_steps=2,
               guidance_scale=5.0, controlnet_conditioning_scale=0.8,
               pag_scale=2.0, pag_applied_layers="attn1",
               key=jax.random.PRNGKey(0), output_type="np").images
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(out).all()


# ------------------------------------------------------------- PixArt-Sigma
def test_pag_pixart_sigma():
    from test_pipeline_pixart import get_dummy_pipeline as pixart_dummy

    from diffusers_tpu.pipelines.pag.pipeline_pag_pixart_sigma import PixArtSigmaPAGPipeline

    pipe = pixart_dummy(cls=PixArtSigmaPAGPipeline)
    outs = []
    for pag_scale in (0.0, 2.0):
        out = pipe("a watercolor fox", height=8, width=8, num_inference_steps=2,
                   guidance_scale=4.5, use_resolution_binning=False,
                   pag_scale=pag_scale, pag_applied_layers="transformer_blocks",
                   key=jax.random.PRNGKey(0), output_type="np").images
        assert np.isfinite(out).all()
        outs.append(out)
    assert _differs(*outs)


# --------------------------------------------------------------- AnimateDiff
def test_pag_animatediff():
    from test_pipeline_animatediff import get_dummy_pipeline as ad_dummy

    from diffusers_tpu.pipelines.pag.pipeline_pag_sd_animatediff import AnimateDiffPAGPipeline

    base = ad_dummy()
    comps = {k: v for k, v in base.components.items()
             if k in ("vae", "text_encoder", "tokenizer", "unet", "motion_adapter", "scheduler")}
    pipe = AnimateDiffPAGPipeline(**comps)
    out = pipe("a cat surfing", num_frames=3, num_inference_steps=2, guidance_scale=6.0,
               pag_scale=2.0, pag_applied_layers="attn1",
               key=jax.random.PRNGKey(0), output_type="np").frames
    assert out.shape == (1, 3, 8, 8, 3)
    assert np.isfinite(out).all()


# --------------------------------------------------------------- SD3 img2img
def test_pag_sd3_img2img():
    from test_pipelines_img2img_inpaint_sd3 import get_dummy_sd3_pipeline

    from diffusers_tpu.pipelines.pag.pipeline_pag_sd_3_img2img import StableDiffusion3PAGImg2ImgPipeline

    pipe = get_dummy_sd3_pipeline(StableDiffusion3PAGImg2ImgPipeline)
    image = np.random.RandomState(0).rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    out = pipe("a cat", image=image, strength=0.8, num_inference_steps=4, guidance_scale=6.0,
               max_sequence_length=16, pag_scale=2.0, pag_applied_layers="transformer_blocks",
               key=jax.random.PRNGKey(0), output_type="np").images
    assert out.shape == (1, 8, 8, 3)
    assert np.isfinite(out).all()


# --------------------------------------------------- ControlNet inpaint (SD)
def test_pag_controlnet_sd_inpaint():
    from test_controlnet import _tiny_cn
    from test_pipeline_stable_diffusion import get_dummy_pipeline

    from diffusers_tpu.pipelines.pag.pipeline_pag_controlnet_sd_inpaint import (
        StableDiffusionControlNetPAGInpaintPipeline,
    )

    base = get_dummy_pipeline()
    cn, cn_params = _tiny_cn(1)
    comps = {k: v for k, v in base.components.items()
             if k in ("vae", "text_encoder", "tokenizer", "unet", "scheduler")}
    pipe = StableDiffusionControlNetPAGInpaintPipeline(controlnet=(cn, cn_params), **comps)
    rng = np.random.RandomState(0)
    image = rng.rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    mask = np.zeros((8, 8), np.float32)
    mask[2:6, 2:6] = 1.0
    cond = rng.rand(1, 3, 16, 16).astype(np.float32)
    out = pipe("a bird", image=image, mask_image=mask, control_image=cond,
               num_inference_steps=2, guidance_scale=6.0,
               pag_scale=2.0, pag_applied_layers="attn1",
               key=jax.random.PRNGKey(0), output_type="np").images
    assert out.shape == (1, 8, 8, 3)
    assert np.isfinite(out).all()
