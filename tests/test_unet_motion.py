"""UNetMotionModel / MotionAdapter parity vs the torch reference."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.unets.unet_motion_model import MotionAdapter, UNetMotionModel

sys.path.insert(0, "/root/reference/src")

MOTION_TINY = dict(
    sample_size=16,
    in_channels=4,
    out_channels=4,
    down_block_types=("CrossAttnDownBlockMotion", "DownBlockMotion"),
    up_block_types=("UpBlockMotion", "CrossAttnUpBlockMotion"),
    block_out_channels=(32, 64),
    layers_per_block=2,
    num_attention_heads=2,
    cross_attention_dim=32,
    norm_num_groups=8,
    motion_num_attention_heads=4,
    use_motion_mid_block=True,
)


def _parity(config, num_frames=3, atol=5e-5):
    torch = pytest.importorskip("torch")
    from diffusers import UNetMotionModel as TorchUNet

    tm = TorchUNet(**config)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = UNetMotionModel(**config)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, num_frames, 16, 16).astype(np.float32)
    ehs = rng.randn(2 * num_frames, 8, config["cross_attention_dim"]).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), 7, torch.from_numpy(ehs)).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), 7, jnp.asarray(ehs)).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < atol, np.max(np.abs(out - ref))


def test_motion_unet_parity():
    _parity(MOTION_TINY)


def test_motion_unet_parity_no_motion_mid_block():
    cfg = dict(MOTION_TINY)
    cfg["use_motion_mid_block"] = False
    _parity(cfg)


def test_from_unet2d_merges_spatial_and_motion_weights():
    torch = pytest.importorskip("torch")
    from diffusers import MotionAdapter as TorchAdapter
    from diffusers import UNet2DConditionModel as TorchUNet2D
    from diffusers import UNetMotionModel as TorchMotion

    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel

    unet_cfg = dict(
        sample_size=16,
        in_channels=4,
        out_channels=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(32, 64),
        layers_per_block=2,
        attention_head_dim=2,
        cross_attention_dim=32,
        norm_num_groups=8,
    )
    adapter_cfg = dict(
        block_out_channels=(32, 64),
        motion_layers_per_block=2,
        motion_num_attention_heads=4,
        motion_norm_num_groups=8,
        use_motion_mid_block=True,
    )

    t_unet = TorchUNet2D(**unet_cfg)
    t_adapter = TorchAdapter(**adapter_cfg)
    t_motion = TorchMotion.from_unet2d(t_unet, t_adapter)
    t_motion.eval()

    unet = UNet2DConditionModel(**unet_cfg)
    unet_params = convert_torch_state_dict(unet, {k: v.detach().numpy() for k, v in t_unet.state_dict().items()})
    adapter = MotionAdapter(**adapter_cfg)
    adapter_params = convert_torch_state_dict(
        adapter, {k: v.detach().numpy() for k, v in t_adapter.state_dict().items()}
    )
    m, params = UNetMotionModel.from_unet2d(unet, unet_params, adapter, adapter_params)

    rng = np.random.RandomState(3)
    x = rng.randn(1, 4, 2, 16, 16).astype(np.float32)
    ehs = rng.randn(2, 8, 32).astype(np.float32)
    with torch.no_grad():
        ref = t_motion(torch.from_numpy(x), 11, torch.from_numpy(ehs)).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), 11, jnp.asarray(ehs)).sample)
    assert np.max(np.abs(out - ref)) < 5e-5, np.max(np.abs(out - ref))
