"""Round-4 variant pipelines: PAG SDXL/SD3, ControlNet img2img/inpaint,
Flux Prior Redux, LTX image2video (reference files of the same names under
pipelines/pag, pipelines/controlnet, pipelines/flux, pipelines/ltx)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# ---------------------------------------------------------------- PAG SDXL
def test_pag_sdxl_pipeline():
    from diffusers_tpu.pipelines.pag.pipeline_pag_sd_xl import StableDiffusionXLPAGPipeline
    from test_pipeline_sdxl import get_dummy_pipeline

    base = get_dummy_pipeline()
    comps = {k: v for k, v in base.components.items() if k not in ("image_encoder", "feature_extractor")}
    pipe = StableDiffusionXLPAGPipeline(**comps)
    kwargs = dict(num_inference_steps=2, guidance_scale=5.0, key=jax.random.PRNGKey(0), output_type="np")

    plain = base("a cat", **kwargs).images
    zero_pag = pipe("a cat", pag_scale=0.0, pag_applied_layers="attn1", **kwargs).images
    np.testing.assert_allclose(zero_pag, plain, atol=1e-4)  # pag_scale=0 == base

    pag = pipe("a cat", pag_scale=3.0, pag_applied_layers="attn1", **kwargs).images
    assert np.isfinite(pag).all()
    assert np.abs(pag - plain).max() > 1e-6  # guidance actually applied


# ---------------------------------------------------------------- PAG SD3
def _sd3_components():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.clip import CLIPTextModelWithProjection
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.models.transformers.transformer_sd3 import SD3Transformer2DModel
    from diffusers_tpu.schedulers import FlowMatchEulerDiscreteScheduler
    from test_pipelines_img2img_inpaint_sd3 import DummyTokenizer

    key = jax.random.PRNGKey(0)
    transformer = SD3Transformer2DModel(
        sample_size=8, patch_size=2, in_channels=4, num_layers=2, attention_head_dim=8,
        num_attention_heads=2, joint_attention_dim=32, caption_projection_dim=16,
        pooled_projection_dim=32, out_channels=4, pos_embed_max_size=96,
    )
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,), down_block_types=("DownEncoderBlock2D",),
        up_block_types=("UpDecoderBlock2D",), latent_channels=4, layers_per_block=1,
        norm_num_groups=4, sample_size=8, scaling_factor=1.5, shift_factor=0.06,
    )
    te1 = CLIPTextModelWithProjection(vocab_size=1000, hidden_size=8, intermediate_size=16,
                                      num_hidden_layers=1, num_attention_heads=2, projection_dim=16)
    te2 = CLIPTextModelWithProjection(vocab_size=1000, hidden_size=8, intermediate_size=16,
                                      num_hidden_layers=1, num_attention_heads=2, projection_dim=16)
    t5 = T5EncoderModel(vocab_size=1000, d_model=32, d_kv=8, d_ff=32, num_layers=1, num_heads=2,
                        feed_forward_proj="gated-gelu")
    return dict(
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


def test_pag_sd3_pipeline():
    from diffusers_tpu.pipelines.pag.pipeline_pag_sd_3 import StableDiffusion3PAGPipeline
    from diffusers_tpu.pipelines.stable_diffusion_3.pipeline_stable_diffusion_3 import (
        StableDiffusion3Pipeline,
    )

    comps = _sd3_components()
    base = StableDiffusion3Pipeline(**comps)
    pipe = StableDiffusion3PAGPipeline(**comps)
    kwargs = dict(height=8, width=8, num_inference_steps=2, guidance_scale=5.0,
                  max_sequence_length=16, key=jax.random.PRNGKey(0), output_type="np")

    plain = base("a painting", **kwargs).images
    zero = pipe("a painting", pag_scale=0.0, pag_applied_layers=r"transformer_blocks\.1", **kwargs).images
    np.testing.assert_allclose(zero, plain, atol=1e-4)

    pag = pipe("a painting", pag_scale=3.0, pag_applied_layers=r"transformer_blocks\.1", **kwargs).images
    assert np.isfinite(pag).all()
    assert np.abs(pag - plain).max() > 1e-6


# ------------------------------------------------------- ControlNet variants
def _sd_controlnet_components():
    from diffusers_tpu.models.controlnets.controlnet import ControlNetModel
    from test_pipeline_stable_diffusion import get_dummy_pipeline

    base = get_dummy_pipeline()
    cn = ControlNetModel(
        in_channels=4,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        block_out_channels=(8, 16),
        layers_per_block=1,
        attention_head_dim=2,
        cross_attention_dim=16,
        norm_num_groups=4,
        conditioning_embedding_out_channels=(8, 16),
    )
    comps = {k: v for k, v in base.components.items() if k not in ("image_encoder", "feature_extractor")}
    comps["controlnet"] = (cn, cn.init_params(jax.random.PRNGKey(1)))
    return comps


def test_controlnet_img2img():
    from diffusers_tpu.pipelines.controlnet.pipeline_controlnet_img2img import (
        StableDiffusionControlNetImg2ImgPipeline,
    )

    pipe = StableDiffusionControlNetImg2ImgPipeline(**_sd_controlnet_components())
    rng = np.random.RandomState(0)
    image = rng.rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    cond = rng.rand(1, 3, 16, 16).astype(np.float32)
    out = pipe("a bird", image=image, control_image=cond, strength=0.8,
               num_inference_steps=4, guidance_scale=5.0,
               key=jax.random.PRNGKey(0), output_type="np").images
    assert out.shape == (1, 8, 8, 3) and np.isfinite(out).all()
    with pytest.raises(ValueError, match="strength"):
        pipe("x", image=image, control_image=cond, strength=2.0, num_inference_steps=2)


def test_controlnet_inpaint_unmasked_exactness():
    from diffusers_tpu.pipelines.controlnet.pipeline_controlnet_inpaint import (
        StableDiffusionControlNetInpaintPipeline,
    )

    pipe = StableDiffusionControlNetInpaintPipeline(**_sd_controlnet_components())
    rng = np.random.RandomState(0)
    image = rng.rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    cond = rng.rand(1, 3, 16, 16).astype(np.float32)
    mask = np.zeros((1, 1, 8, 8), np.float32)
    mask[:, :, 2:6, 2:6] = 1.0

    key = jax.random.PRNGKey(7)
    out = pipe("repair", image=image, mask_image=mask, control_image=cond, strength=1.0,
               num_inference_steps=3, guidance_scale=5.0, key=key,
               output_type="latent", return_dict=False)[0]

    vae, vae_params = pipe.vae
    _, enc_key, _ = jax.random.split(key, 3)
    init = jnp.asarray(pipe.image_processor.preprocess(image))
    lat = vae.encode(vae_params, init).sample(enc_key) * vae.config.scaling_factor
    from diffusers_tpu.pipelines.inpaint_utils import resize_mask_nearest

    mask_lat = resize_mask_nearest(mask, lat.shape[2], lat.shape[3])
    keep = np.broadcast_to(mask_lat == 0, lat.shape)
    out, lat = np.asarray(out), np.asarray(lat)
    assert keep.any() and (~keep).any()
    np.testing.assert_allclose(out[keep], lat[keep], atol=1e-5)
    assert np.abs(out[~keep] - lat[~keep]).max() > 1e-3


# --------------------------------------------------------- Flux Prior Redux
def test_flux_prior_redux():
    from diffusers_tpu.pipelines.flux.modeling_flux import ReduxImageEncoder
    from diffusers_tpu.pipelines.flux.pipeline_flux_prior_redux import FluxPriorReduxPipeline

    class DummyVision:
        def __call__(self, params, pixel_values):
            class Out:
                pass

            o = Out()
            # traceable deterministic features: per-channel means tiled out
            feats = jnp.mean(pixel_values.reshape(pixel_values.shape[0], -1), axis=-1)
            base = jnp.arange(5 * 6, dtype=jnp.float32).reshape(1, 5, 6) / 30.0
            o.last_hidden_state = base + feats[:, None, None]
            return o

    embedder = ReduxImageEncoder(redux_dim=6, txt_in_features=16)
    pipe = FluxPriorReduxPipeline(
        image_encoder=(DummyVision(), {}),
        image_embedder=(embedder, embedder.init_params(jax.random.PRNGKey(0))),
    )
    image = np.random.RandomState(0).rand(1, 3, 8, 8).astype(np.float32)
    out = pipe(image)
    # T5-width zeros (512) + 5 image tokens appended
    assert out.prompt_embeds.shape == (1, 512 + 5, 16)
    assert out.pooled_prompt_embeds.shape == (1, 768)
    assert np.isfinite(np.asarray(out.prompt_embeds)).all()
    # scaling applies
    half = pipe(image, prompt_embeds_scale=0.5)
    np.testing.assert_allclose(np.asarray(half.prompt_embeds),
                               np.asarray(out.prompt_embeds) * 0.5, atol=1e-6)


# ------------------------------------------------------------- LTX i2v
def test_ltx_image2video():
    from diffusers_tpu.pipelines.ltx.pipeline_ltx_image2video import LTXImageToVideoPipeline
    from test_pipeline_ltx import get_dummy_pipeline

    base = get_dummy_pipeline()
    pipe = LTXImageToVideoPipeline(**base.components)
    rng = np.random.RandomState(0)
    image = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    out = pipe(image=image, prompt="a river", height=32, width=32, num_frames=9,
               num_inference_steps=2, guidance_scale=3.0, key=jax.random.PRNGKey(0),
               output_type="np")
    assert np.asarray(out.frames).ndim == 5
    assert np.isfinite(np.asarray(out.frames)).all()


# ------------------------------------------------- ControlNet-Union (SDXL)
UNION_TINY = dict(
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
    num_control_type=6,
    num_trans_channel=8,
    num_trans_head=2,
    num_trans_layer=1,
    num_proj_channel=8,
)


def test_controlnet_union_parity():
    """Union model output matches the torch reference layer for layer."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    torch = pytest.importorskip("torch")
    from diffusers import ControlNetUnionModel as TorchUnion

    from diffusers_tpu.models.controlnets.controlnet_union import ControlNetUnionModel
    from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

    tm = TorchUnion(**UNION_TINY)
    tm.eval()
    m = ControlNetUnionModel(**UNION_TINY)
    params = convert_torch_state_dict(m, {k: v.numpy() for k, v in tm.state_dict().items()})

    rng = np.random.RandomState(0)
    sample = rng.randn(2, 4, 16, 16).astype(np.float32)
    cond = rng.rand(2, 3, 32, 32).astype(np.float32)
    ehs = rng.randn(2, 7, 32).astype(np.float32)
    text_embeds = rng.randn(2, 16).astype(np.float32)
    time_ids = rng.randn(2, 6).astype(np.float32)
    control_type = np.zeros((2, 6), np.float32)
    control_type[:, 2] = 1.0
    t = 314

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(sample), t,
            encoder_hidden_states=torch.from_numpy(ehs),
            controlnet_cond=[torch.from_numpy(cond)],
            control_type=torch.from_numpy(control_type),
            control_type_idx=[2],
            conditioning_scale=1.0,
            added_cond_kwargs={"text_embeds": torch.from_numpy(text_embeds),
                               "time_ids": torch.from_numpy(time_ids)},
            return_dict=True,
        )
    out = m(
        params, jnp.asarray(sample), t,
        encoder_hidden_states=jnp.asarray(ehs),
        controlnet_cond=[jnp.asarray(cond)],
        control_type=jnp.asarray(control_type),
        control_type_idx=[2],
        conditioning_scale=1.0,
        added_cond_kwargs={"text_embeds": jnp.asarray(text_embeds),
                           "time_ids": jnp.asarray(time_ids)},
    )
    ref_mid = ref.mid_block_res_sample.numpy()
    np.testing.assert_allclose(np.asarray(out.mid_block_res_sample), ref_mid, atol=2e-4)
    for a, b in zip(out.down_block_res_samples, ref.down_block_res_samples):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-4)


def test_controlnet_union_sdxl_pipeline():
    from diffusers_tpu.models.controlnets.controlnet_union import ControlNetUnionModel
    from diffusers_tpu.pipelines.controlnet.pipeline_controlnet_union_sd_xl import (
        StableDiffusionXLControlNetUnionPipeline,
    )
    from test_pipeline_sdxl import get_dummy_pipeline

    base = get_dummy_pipeline()
    cn = ControlNetUnionModel(**UNION_TINY)
    comps = {k: v for k, v in base.components.items() if k not in ("image_encoder", "feature_extractor")}
    pipe = StableDiffusionXLControlNetUnionPipeline(
        controlnet=(cn, cn.init_params(jax.random.PRNGKey(1))), **comps)
    cond = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    out = pipe("a bird", control_image=[cond], control_mode=[3], height=16, width=16,
               num_inference_steps=2, guidance_scale=5.0,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()


# --------------------------------------------------- SDXL InstructPix2Pix
def test_sdxl_instruct_pix2pix():
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
    from diffusers_tpu.pipelines.stable_diffusion_xl.pipeline_stable_diffusion_xl_instruct_pix2pix import (
        StableDiffusionXLInstructPix2PixPipeline,
    )
    from test_pipeline_sdxl import get_dummy_pipeline

    base = get_dummy_pipeline()
    # 8-channel UNet: 4 latent + 4 image-conditioning channels
    unet = UNet2DConditionModel(
        sample_size=8, in_channels=8, out_channels=4,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(8, 16), layers_per_block=1, attention_head_dim=(2, 4),
        transformer_layers_per_block=(1, 2), use_linear_projection=True,
        cross_attention_dim=32, addition_embed_type="text_time",
        addition_time_embed_dim=8, projection_class_embeddings_input_dim=16 + 6 * 8,
        norm_num_groups=4,
    )
    comps = {k: v for k, v in base.components.items() if k not in ("image_encoder", "feature_extractor")}
    comps["unet"] = (unet, unet.init_params(jax.random.PRNGKey(2)))
    pipe = StableDiffusionXLInstructPix2PixPipeline(**comps)
    image = np.random.RandomState(0).rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    out = pipe("make it snowy", image=image, num_inference_steps=3,
               guidance_scale=5.0, image_guidance_scale=1.5,
               key=jax.random.PRNGKey(0), output_type="np").images
    assert out.shape == (1, 8, 8, 3) and np.isfinite(out).all()
