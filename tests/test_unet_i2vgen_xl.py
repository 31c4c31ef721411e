"""I2VGenXLUNet parity vs torch reference (tiny config).

Reference: models/unets/unet_i2vgen_xl.py:96.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.unets.unet_i2vgen_xl import I2VGenXLUNet

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


def test_i2vgen_xl_unet_parity():
    torch = pytest.importorskip("torch")
    from diffusers import I2VGenXLUNet as TorchI2V

    tm = TorchI2V(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = I2VGenXLUNet(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    # H=W=64 exercises the AdaptiveAvgPool2d((32,32)) path non-trivially
    x = rng.randn(1, 4, 3, 64, 64).astype(np.float32)
    il = rng.randn(1, 4, 3, 64, 64).astype(np.float32)
    ie = rng.randn(1, 16).astype(np.float32)
    ctx = rng.randn(1, 5, 16).astype(np.float32)
    t = np.array(500, np.int64)
    fps = np.array([16], np.int64)

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(t), fps=torch.from_numpy(fps),
            image_latents=torch.from_numpy(il), image_embeddings=torch.from_numpy(ie),
            encoder_hidden_states=torch.from_numpy(ctx),
        ).sample.numpy()
    ours = np.asarray(
        m(params, jnp.asarray(x), 500, jnp.asarray(fps), jnp.asarray(il),
          jnp.asarray(ie), jnp.asarray(ctx)).sample
    )
    assert ours.shape == ref.shape
    err = np.max(np.abs(ours - ref))
    assert err < 5e-4, f"I2VGenXL UNet diverges: {err}"
