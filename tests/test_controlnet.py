"""ControlNetModel parity vs torch reference + UNet residual-injection parity."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.controlnets.controlnet import ControlNetModel
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel

sys.path.insert(0, "/root/reference/src")

CN_CFG = dict(
    in_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    block_out_channels=(32, 64),
    layers_per_block=2,
    attention_head_dim=8,
    cross_attention_dim=32,
    norm_num_groups=32,
    conditioning_embedding_out_channels=(16, 32),
)

UNET_CFG = dict(
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


def test_controlnet_parity_and_unet_injection():
    torch = pytest.importorskip("torch")
    from diffusers import ControlNetModel as TorchCN, UNet2DConditionModel as TorchUNet

    tcn = TorchCN(**CN_CFG)
    tcn.eval()
    cn = ControlNetModel(**CN_CFG)
    cn_params = convert_torch_state_dict(cn, {k: v.detach().numpy() for k, v in tcn.state_dict().items()})

    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 16, 16).astype(np.float32)
    ehs = rng.randn(1, 8, 32).astype(np.float32)
    cond = rng.rand(1, 3, 32, 32).astype(np.float32)  # conditioning at 2x (2 conv strides)

    with torch.no_grad():
        ref = tcn(
            torch.from_numpy(x), 5, torch.from_numpy(ehs),
            controlnet_cond=torch.from_numpy(cond), conditioning_scale=0.7, return_dict=True,
        )
    out = cn(cn_params, jnp.asarray(x), 5, jnp.asarray(ehs), jnp.asarray(cond), conditioning_scale=0.7)

    assert len(out.down_block_res_samples) == len(ref.down_block_res_samples)
    for mine, theirs in zip(out.down_block_res_samples, ref.down_block_res_samples):
        assert np.max(np.abs(np.asarray(mine) - theirs.numpy())) < 5e-5
    assert np.max(np.abs(np.asarray(out.mid_block_res_sample) - ref.mid_block_res_sample.numpy())) < 5e-5

    # UNet injection parity
    tu = TorchUNet(**UNET_CFG)
    tu.eval()
    u = UNet2DConditionModel(**UNET_CFG)
    u_params = convert_torch_state_dict(u, {k: v.detach().numpy() for k, v in tu.state_dict().items()})
    with torch.no_grad():
        ref_out = tu(
            torch.from_numpy(x), 5, torch.from_numpy(ehs),
            down_block_additional_residuals=[r.clone() for r in ref.down_block_res_samples],
            mid_block_additional_residual=ref.mid_block_res_sample.clone(),
        ).sample.numpy()
    mine_out = np.asarray(
        u(
            u_params, jnp.asarray(x), 5, jnp.asarray(ehs),
            down_block_additional_residuals=out.down_block_res_samples,
            mid_block_additional_residual=out.mid_block_res_sample,
        ).sample
    )
    assert np.max(np.abs(mine_out - ref_out)) < 2e-4, np.max(np.abs(mine_out - ref_out))
