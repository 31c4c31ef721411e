"""VisualCloze: processor grid preprocessing behavior vs the torch reference +
generation pipeline smoke (in-context grid -> target crop).

Reference: `/root/reference/src/diffusers/pipelines/visualcloze/visualcloze_utils.py:22`,
`pipeline_visualcloze_generation.py:118`.
"""

import sys

import jax
import numpy as np
import pytest
from PIL import Image

from diffusers_tpu.pipelines.visualcloze import VisualClozeGenerationPipeline, VisualClozeProcessor

sys.path.insert(0, "/root/reference/src")


def _grid(rng, rows=2, cols=2, none_last=True):
    grid = []
    for i in range(rows):
        row = []
        for j in range(cols):
            if none_last and i == rows - 1 and j == cols - 1:
                row.append(None)
            else:
                row.append(Image.fromarray(
                    (rng.rand(40, 56, 3) * 255).astype(np.uint8)))
        grid.append(row)
    return grid


@pytest.mark.refparity
def test_visualcloze_processor_parity():
    torch = pytest.importorskip("torch")
    from diffusers.pipelines.visualcloze.visualcloze_utils import (
        VisualClozeProcessor as TorchProcessor,
    )

    rng = np.random.RandomState(0)
    grid1 = _grid(rng)
    grid2 = [[im.copy() if im is not None else None for im in row] for row in grid1]

    tp = TorchProcessor(resolution=64, vae_scale_factor=2)
    jp = VisualClozeProcessor(resolution=64, vae_scale_factor=2)
    ref = tp.preprocess("edit the image", "a red ball", grid1, vae_scale_factor=2)
    out = jp.preprocess("edit the image", "a red ball", grid2, vae_scale_factor=2)

    assert out["image_size"] == ref["image_size"]
    assert out["target_position"] == ref["target_position"]
    assert str(out["layout_prompt"][0]) == str(ref["layout_prompt"][0])
    for r_row, o_row in zip(ref["init_image"][0], out["init_image"][0]):
        for r, o in zip(r_row, o_row):
            assert np.max(np.abs(r.numpy() - o)) < 1e-5
    for r_row, o_row in zip(ref["mask"][0], out["mask"][0]):
        for r, o in zip(r_row, o_row):
            assert np.array_equal(r.numpy(), o)


def test_visualcloze_generation_smoke():
    from diffusers_tpu.models.transformers.transformer_flux import FluxTransformer2DModel
    from tests.test_pipeline_flux import get_dummy_pipeline

    base = get_dummy_pipeline()
    transformer = FluxTransformer2DModel(
        patch_size=1, in_channels=12, out_channels=4, num_layers=1, num_single_layers=1,
        attention_head_dim=16, num_attention_heads=2, joint_attention_dim=32,
        pooled_projection_dim=32, axes_dims_rope=(4, 6, 6),
    )
    pipe = VisualClozeGenerationPipeline(
        scheduler=base.scheduler, vae=base.vae, text_encoder=base.text_encoder,
        tokenizer=base.tokenizer, text_encoder_2=base.text_encoder_2,
        tokenizer_2=base.tokenizer_2,
        transformer=(transformer, transformer.init_params(jax.random.PRNGKey(1))),
        resolution=16,
    )
    rng = np.random.RandomState(0)
    grid = _grid(rng)
    out = pipe(task_prompt="colorize the sketch", content_prompt="a红ball on grass",
               image=grid, num_inference_steps=2, guidance_scale=1.0,
               key=jax.random.PRNGKey(0), max_sequence_length=8, output_type="np")
    imgs = np.asarray(out.images)
    # one target per sample, cropped to the target tile size
    assert imgs.ndim == 4 and imgs.shape[0] == 1 and np.isfinite(imgs).all()
