"""Dynamic module / custom pipeline loading (reference
`utils/dynamic_modules_utils.py:460`, `pipeline_loading_utils.py:496`;
fixture mirrors `tests/fixtures/custom_pipeline/pipeline.py`)."""

import os

import jax
import numpy as np
import pytest

from diffusers_tpu import DiffusionPipeline
from diffusers_tpu.models.unets.unet_2d import UNet2DModel
from diffusers_tpu.schedulers import DDPMScheduler

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "custom_pipeline")


def _save_tiny_ddpm(tmp_path):
    unet = UNet2DModel(
        sample_size=8, in_channels=3, out_channels=3, layers_per_block=1,
        block_out_channels=(8, 8), norm_num_groups=4,
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    )
    params = unet.init_params(jax.random.PRNGKey(0))
    scheduler = DDPMScheduler(num_train_timesteps=50)
    d = str(tmp_path / "ddpm")
    os.makedirs(os.path.join(d, "unet"), exist_ok=True)
    os.makedirs(os.path.join(d, "scheduler"), exist_ok=True)
    unet.save_pretrained(os.path.join(d, "unet"), params)
    scheduler.save_pretrained(os.path.join(d, "scheduler"))
    import json

    with open(os.path.join(d, "model_index.json"), "w") as f:
        json.dump({
            "_class_name": "DDPMPipeline",
            "unet": ["diffusers_tpu", "UNet2DModel"],
            "scheduler": ["diffusers_tpu", "DDPMScheduler"],
        }, f)
    return d


def test_custom_pipeline_requires_trust(tmp_path):
    d = _save_tiny_ddpm(tmp_path)
    with pytest.raises(ValueError, match="trust_remote_code"):
        DiffusionPipeline.from_pretrained(d, custom_pipeline=FIXTURE)


def test_custom_pipeline_loads_and_runs(tmp_path):
    d = _save_tiny_ddpm(tmp_path)
    pipe = DiffusionPipeline.from_pretrained(d, custom_pipeline=FIXTURE, trust_remote_code=True)
    assert type(pipe).__name__ == "CustomLocalPipeline"
    image, marker = pipe(batch_size=1, num_inference_steps=2, key=jax.random.PRNGKey(0))
    assert marker == "This is a local test"
    assert np.asarray(image).shape == (1, 8, 8, 3)
    assert np.isfinite(np.asarray(image)).all()


def test_custom_pipeline_module_inside_checkpoint(tmp_path):
    import shutil

    d = _save_tiny_ddpm(tmp_path)
    shutil.copyfile(os.path.join(FIXTURE, "pipeline.py"), os.path.join(d, "my_pipeline.py"))
    pipe = DiffusionPipeline.from_pretrained(d, custom_pipeline="my_pipeline", trust_remote_code=True)
    assert type(pipe).__name__ == "CustomLocalPipeline"


def test_disable_remote_code_env(tmp_path, monkeypatch):
    d = _save_tiny_ddpm(tmp_path)
    monkeypatch.setenv("DIFFUSERS_TPU_DISABLE_REMOTE_CODE", "1")
    with pytest.raises(ValueError, match="DIFFUSERS_TPU_DISABLE_REMOTE_CODE"):
        DiffusionPipeline.from_pretrained(d, custom_pipeline=FIXTURE, trust_remote_code=True)


def test_get_class_by_name_and_base_class():
    from diffusers_tpu.utils.dynamic_modules_utils import get_class_from_dynamic_module

    cls1 = get_class_from_dynamic_module(FIXTURE, class_name="CustomLocalPipeline",
                                         trust_remote_code=True)
    cls2 = get_class_from_dynamic_module(FIXTURE, base_class=DiffusionPipeline,
                                         trust_remote_code=True)
    assert cls1 is cls2
