"""UNet2DConditionModel parity tests vs the torch reference (tiny SD-style and
tiny SDXL-style configs, mirroring `tests/models/unets/test_models_unet_2d_condition.py`)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel

sys.path.insert(0, "/root/reference/src")

SD_TINY = dict(
    sample_size=16,
    in_channels=4,
    out_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    block_out_channels=(32, 64),
    layers_per_block=2,
    attention_head_dim=8,
    cross_attention_dim=32,
    norm_num_groups=32,
)

SDXL_TINY = dict(
    sample_size=16,
    in_channels=4,
    out_channels=4,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(32, 64),
    layers_per_block=2,
    attention_head_dim=(2, 4),
    transformer_layers_per_block=(1, 2),
    use_linear_projection=True,
    addition_embed_type="text_time",
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=80,  # 2*32 text + 6*8 time ids
    cross_attention_dim=64,
    norm_num_groups=32,
)


def test_sd_style_parity():
    torch = pytest.importorskip("torch")
    from diffusers import UNet2DConditionModel as TorchUNet

    tm = TorchUNet(**SD_TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = UNet2DConditionModel(**SD_TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    ehs = rng.randn(2, 8, 32).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), 3, torch.from_numpy(ehs)).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), 3, jnp.asarray(ehs)).sample)
    assert np.max(np.abs(out - ref)) < 5e-5, np.max(np.abs(out - ref))


def test_sdxl_style_parity():
    torch = pytest.importorskip("torch")
    from diffusers import UNet2DConditionModel as TorchUNet

    tm = TorchUNet(**SDXL_TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = UNet2DConditionModel(**SDXL_TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    ehs = rng.randn(2, 8, 64).astype(np.float32)
    text_embeds = rng.randn(2, 32).astype(np.float32)
    time_ids = rng.randn(2, 6).astype(np.float32)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x),
            5,
            torch.from_numpy(ehs),
            added_cond_kwargs={
                "text_embeds": torch.from_numpy(text_embeds),
                "time_ids": torch.from_numpy(time_ids),
            },
        ).sample.numpy()
    out = np.asarray(
        m(
            params,
            jnp.asarray(x),
            5,
            jnp.asarray(ehs),
            added_cond_kwargs={"text_embeds": jnp.asarray(text_embeds), "time_ids": jnp.asarray(time_ids)},
        ).sample
    )
    assert np.max(np.abs(out - ref)) < 5e-5, np.max(np.abs(out - ref))
