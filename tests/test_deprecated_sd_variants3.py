"""Round-5 deprecated batch 3: AltDiffusion (XLM-Roberta series encoder) and
Paint-by-Example (exemplar-conditioned inpainting)."""

import jax
import numpy as np


def _sd_components():
    from tests.test_pipeline_stable_diffusion import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    return {k: v for k, v in pipe.components.items()
            if k in ("vae", "text_encoder", "tokenizer", "unet", "scheduler")}


def test_alt_diffusion_roberta_series_and_pipeline():
    from diffusers_tpu.pipelines.deprecated.alt_diffusion import (
        AltDiffusionPipeline,
        RobertaSeriesModelWithTransformation,
    )

    comps = _sd_components()
    key = jax.random.PRNGKey(0)
    te = RobertaSeriesModelWithTransformation(
        vocab_size=1024, hidden_size=8, intermediate_size=16, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=80, project_dim=16)
    comps["text_encoder"] = (te, te.init_params(key))
    pipe = AltDiffusionPipeline(**comps)
    out = pipe("ein rotes haus", height=16, width=16, num_inference_steps=2,
               guidance_scale=6.0, key=key, output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()

    # pre-transformation variant (second-to-last hidden + pre-LN)
    te2 = RobertaSeriesModelWithTransformation(
        vocab_size=1024, hidden_size=8, intermediate_size=16, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=80, project_dim=16,
        has_pre_transformation=True)
    p2 = te2.init_params(key)
    ids = np.array([[5, 9, 3, 1, 1]])
    o = te2(p2, jax.numpy.asarray(ids))
    assert np.asarray(o.projection_state).shape == (1, 5, 16)
    assert np.isfinite(np.asarray(o.projection_state)).all()


def test_paint_by_example_pipeline():
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
    from diffusers_tpu.pipelines.deprecated.paint_by_example import (
        PaintByExampleImageEncoder,
        PaintByExamplePipeline,
    )

    comps = _sd_components()
    key = jax.random.PRNGKey(0)
    unet9 = UNet2DConditionModel(
        sample_size=8, in_channels=9, out_channels=4,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(8, 16), layers_per_block=1, attention_head_dim=2,
        cross_attention_dim=16, norm_num_groups=4)
    encoder = PaintByExampleImageEncoder(
        hidden_size=8, intermediate_size=16, num_hidden_layers=4, num_attention_heads=2,
        image_size=16, patch_size=8, projection_dim=16)
    pipe = PaintByExamplePipeline(
        vae=comps["vae"], image_encoder=(encoder, encoder.init_params(key)),
        unet=(unet9, unet9.init_params(key)), scheduler=comps["scheduler"])
    rng = np.random.RandomState(0)
    image = rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    mask = np.zeros((1, 1, 16, 16), np.float32)
    mask[..., 8:] = 1.0  # repaint right half
    example = rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    out = pipe(example_image=example, image=image, mask_image=mask,
               num_inference_steps=2, guidance_scale=5.0,
               key=key, output_type="np")
    assert np.asarray(out.images).shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out.images)).all()
