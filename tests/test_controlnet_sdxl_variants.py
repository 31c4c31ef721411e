"""SDXL ControlNet img2img/inpaint + Union img2img/inpaint + PAG img2img
variants (round 4 variant sweep)."""

import jax
import jax.numpy as jnp
import numpy as np

from test_controlnet import _tiny_cn  # SD-tiny config; SDXL needs its own below


def _sdxl_cn():
    from diffusers_tpu.models.controlnets.controlnet import ControlNetModel

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
    return cn, cn.init_params(jax.random.PRNGKey(1))


def _comps():
    from test_pipeline_sdxl import get_dummy_pipeline

    base = get_dummy_pipeline()
    return {k: v for k, v in base.components.items() if k not in ("image_encoder", "feature_extractor")}


def test_sdxl_controlnet_img2img():
    from diffusers_tpu.pipelines.controlnet.pipeline_controlnet_sd_xl_img2img import (
        StableDiffusionXLControlNetImg2ImgPipeline,
    )

    cn, cn_params = _sdxl_cn()
    pipe = StableDiffusionXLControlNetImg2ImgPipeline(controlnet=(cn, cn_params), **_comps())
    rng = np.random.RandomState(0)
    init = rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    cond = rng.rand(1, 3, 32, 32).astype(np.float32)
    out = pipe("a bird", image=jnp.asarray(init), control_image=cond, strength=0.8,
               num_inference_steps=3, guidance_scale=5.0, controlnet_conditioning_scale=0.7,
               key=jax.random.PRNGKey(0), output_type="np").images
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(out).all()


def test_sdxl_controlnet_inpaint():
    from diffusers_tpu.pipelines.controlnet.pipeline_controlnet_inpaint_sd_xl import (
        StableDiffusionXLControlNetInpaintPipeline,
    )

    cn, cn_params = _sdxl_cn()
    pipe = StableDiffusionXLControlNetInpaintPipeline(controlnet=(cn, cn_params), **_comps())
    rng = np.random.RandomState(0)
    init = rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    mask = np.zeros((16, 16), np.float32)
    mask[4:12, 4:12] = 1.0
    cond = rng.rand(1, 3, 32, 32).astype(np.float32)
    out = pipe("a bird", image=jnp.asarray(init), mask_image=mask, control_image=cond,
               num_inference_steps=3, guidance_scale=5.0,
               key=jax.random.PRNGKey(0), output_type="np").images
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(out).all()


def _union_cn():
    from diffusers_tpu.models.controlnets.controlnet_union import ControlNetUnionModel
    from test_pipeline_variants_r4 import UNION_TINY

    cn = ControlNetUnionModel(**UNION_TINY)
    return cn, cn.init_params(jax.random.PRNGKey(1))


def test_sdxl_controlnet_union_img2img():
    from diffusers_tpu.pipelines.controlnet.pipeline_controlnet_union_sd_xl_img2img import (
        StableDiffusionXLControlNetUnionImg2ImgPipeline,
    )

    cn, cn_params = _union_cn()
    pipe = StableDiffusionXLControlNetUnionImg2ImgPipeline(controlnet=(cn, cn_params), **_comps())
    rng = np.random.RandomState(0)
    init = rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    cond = rng.rand(1, 3, 32, 32).astype(np.float32)
    out = pipe("a bird", image=jnp.asarray(init), control_image=[cond], control_mode=[2],
               strength=0.8, num_inference_steps=3, guidance_scale=5.0,
               key=jax.random.PRNGKey(0), output_type="np").images
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(out).all()


def test_sdxl_controlnet_union_inpaint():
    from diffusers_tpu.pipelines.controlnet.pipeline_controlnet_union_inpaint_sd_xl import (
        StableDiffusionXLControlNetUnionInpaintPipeline,
    )

    cn, cn_params = _union_cn()
    pipe = StableDiffusionXLControlNetUnionInpaintPipeline(controlnet=(cn, cn_params), **_comps())
    rng = np.random.RandomState(0)
    init = rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    mask = np.zeros((16, 16), np.float32)
    mask[4:12, 4:12] = 1.0
    cond = rng.rand(1, 3, 32, 32).astype(np.float32)
    out = pipe("a bird", image=jnp.asarray(init), mask_image=mask, control_image=[cond],
               control_mode=[1], num_inference_steps=3, guidance_scale=5.0,
               key=jax.random.PRNGKey(0), output_type="np").images
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(out).all()


def test_pag_controlnet_sdxl_img2img():
    from diffusers_tpu.pipelines.pag.pipeline_pag_controlnet_sd_xl_img2img import (
        StableDiffusionXLControlNetPAGImg2ImgPipeline,
    )

    cn, cn_params = _sdxl_cn()
    pipe = StableDiffusionXLControlNetPAGImg2ImgPipeline(controlnet=(cn, cn_params), **_comps())
    rng = np.random.RandomState(0)
    init = rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    cond = rng.rand(1, 3, 32, 32).astype(np.float32)
    out = pipe("a bird", image=jnp.asarray(init), control_image=cond, strength=0.8,
               num_inference_steps=2, guidance_scale=5.0,
               pag_scale=2.0, pag_applied_layers="attn1",
               key=jax.random.PRNGKey(0), output_type="np").images
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(out).all()
