"""DDPM pipeline end-to-end tests (tiny model, 2-step generation) — mirrors
the reference's hermetic tiny-model pipeline test strategy
(`tests/pipelines/ddpm/test_ddpm.py`)."""

import jax
import numpy as np

from diffusers_tpu.models import UNet2DModel
from diffusers_tpu.pipelines import DDPMPipeline
from diffusers_tpu.schedulers import DDPMScheduler


def make_pipeline():
    model = UNet2DModel(
        sample_size=8,
        in_channels=3,
        out_channels=3,
        block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1,
        attention_head_dim=4,
        norm_num_groups=8,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    scheduler = DDPMScheduler(num_train_timesteps=10)
    return DDPMPipeline(unet=(model, params), scheduler=scheduler)


def test_generation_shapes_and_range():
    pipe = make_pipeline()
    out = pipe(batch_size=2, num_inference_steps=5, key=jax.random.PRNGKey(1), output_type="np")
    images = out.images
    assert images.shape == (2, 8, 8, 3)
    assert images.min() >= 0.0 and images.max() <= 1.0


def test_generation_deterministic_under_key():
    pipe = make_pipeline()
    a = pipe(batch_size=1, num_inference_steps=5, key=jax.random.PRNGKey(7), output_type="np").images
    b = pipe(batch_size=1, num_inference_steps=5, key=jax.random.PRNGKey(7), output_type="np").images
    np.testing.assert_array_equal(a, b)
    c = pipe(batch_size=1, num_inference_steps=5, key=jax.random.PRNGKey(8), output_type="np").images
    assert np.abs(a - c).max() > 1e-6


def test_save_load_roundtrip(tmp_path):
    pipe = make_pipeline()
    pipe.save_pretrained(tmp_path)
    pipe2 = DDPMPipeline.from_pretrained(tmp_path)
    a = pipe(batch_size=1, num_inference_steps=3, key=jax.random.PRNGKey(0), output_type="np").images
    b = pipe2(batch_size=1, num_inference_steps=3, key=jax.random.PRNGKey(0), output_type="np").images
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_loads_reference_serialized_layout(tmp_path):
    """A pipeline saved by us must parse like a reference checkpoint dir:
    model_index.json + per-component folders."""
    import json
    import os

    pipe = make_pipeline()
    pipe.save_pretrained(tmp_path)
    with open(os.path.join(tmp_path, "model_index.json")) as f:
        index = json.load(f)
    assert index["_class_name"] == "DDPMPipeline"
    assert index["unet"] == ["diffusers_tpu", "UNet2DModel"]
    assert os.path.isfile(os.path.join(tmp_path, "unet", "config.json"))
    assert os.path.isfile(os.path.join(tmp_path, "unet", "diffusion_pytorch_model.safetensors"))
    assert os.path.isfile(os.path.join(tmp_path, "scheduler", "scheduler_config.json"))
