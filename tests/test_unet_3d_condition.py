"""UNet3DConditionModel parity vs torch reference (tiny config).

Reference: models/unets/unet_3d_condition.py:58, unet_3d_blocks.py:266-700,
resnet.py:475 (TemporalConvLayer), transformer_temporal.py:41.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.unets.unet_3d_condition import UNet3DConditionModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    in_channels=4,
    out_channels=4,
    down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
    up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
    block_out_channels=(8, 16),
    layers_per_block=1,
    norm_num_groups=4,
    cross_attention_dim=16,
    attention_head_dim=4,
)


def test_unet3d_parity():
    torch = pytest.importorskip("torch")
    from diffusers import UNet3DConditionModel as TorchUNet3D

    tm = TorchUNet3D(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = UNet3DConditionModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 3, 8, 8).astype(np.float32)
    ctx = rng.randn(1, 5, 16).astype(np.float32)
    t = np.array(500, np.int64)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ctx)).sample.numpy()
    ours = np.asarray(m(params, jnp.asarray(x), 500, jnp.asarray(ctx)).sample)
    assert ours.shape == ref.shape
    err = np.max(np.abs(ours - ref))
    assert err < 5e-4, f"UNet3D diverges: {err}"


def test_unet3d_temporal_identity_at_init():
    """TemporalConvLayer zero-inits its last conv — at init the temporal
    convs are identity, so 1-frame and per-frame outputs agree."""
    m = UNet3DConditionModel(**TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 2, 8, 8), jnp.float32)
    ctx = jnp.asarray(rng.randn(1, 5, 16), jnp.float32)
    out = m(params, x, 100, ctx).sample
    assert out.shape == (1, 4, 2, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
