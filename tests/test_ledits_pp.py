"""LEDITS++ (SD): edit-friendly inversion reconstruction oracle + semantic
editing smoke.

The defining property of the edit-friendly DDPM inversion (reference
`pipeline_leditspp_stable_diffusion.py:1225`) is that re-running the DDIM
sampler with the stored variance noises and NO editing prompts reproduces the
input latents exactly — every step's `z` was solved so that
`step(x_t) == anchor(x_{t-1})`, terminating at x0. That algebraic identity is
the oracle here (it holds regardless of the UNet weights).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from diffusers_tpu.pipelines.ledits_pp import LEditsPPPipelineStableDiffusion


def get_pipe():
    from tests.test_pipeline_stable_diffusion import DummyTokenizer, get_dummy_pipeline

    base = get_dummy_pipeline()
    return LEditsPPPipelineStableDiffusion(
        vae=base.vae, text_encoder=base.text_encoder, tokenizer=DummyTokenizer(),
        unet=base.unet, scheduler=base.scheduler,
    )


def _image(rng):
    return Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8))


def test_inversion_reconstructs_input_latents():
    pipe = get_pipe()
    rng = np.random.RandomState(0)
    inv = pipe.invert(_image(rng), num_inversion_steps=4, skip=0.2, key=jax.random.PRNGKey(0))
    assert len(inv.images) == 1 and len(inv.vae_reconstruction_images) == 1

    vae, vae_params = pipe.vae
    pixel = jnp.asarray(pipe.image_processor.preprocess(_image(np.random.RandomState(0))))
    x0 = vae.encode(vae_params, pixel).mode() * vae.config.scaling_factor

    out = pipe(editing_prompt=None, output_type="latent")
    rec = np.asarray(out.images)
    assert rec.shape == x0.shape
    assert np.max(np.abs(rec - np.asarray(x0))) < 1e-3, np.max(np.abs(rec - np.asarray(x0)))


def test_semantic_editing_smoke():
    pipe = get_pipe()
    rng = np.random.RandomState(1)
    pipe.invert(_image(rng), source_prompt="a cat", source_guidance_scale=2.0,
                num_inversion_steps=3, skip=0.1, key=jax.random.PRNGKey(1))
    out = pipe(
        editing_prompt=["sunglasses", "winter"],
        reverse_editing_direction=[False, True],
        edit_guidance_scale=[4.0, 2.0],
        edit_warmup_steps=[0, 1],
        edit_threshold=[0.9, 0.8],
        output_type="np",
    )
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()

    # editing must change the output vs pure reconstruction
    rec = np.asarray(pipe(editing_prompt=None, output_type="np").images)
    assert np.abs(img - rec).max() > 1e-6

    with pytest.raises(NotImplementedError):
        pipe(editing_prompt=["x"], use_intersect_mask=True)
