"""UVit2DModel (aMUSEd) parity vs torch reference (tiny config).

Reference: models/unets/uvit_2d.py:38.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.unets.uvit_2d import UVit2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    hidden_size=16,
    use_bias=False,
    cond_embed_dim=8,
    micro_cond_encode_dim=2,
    micro_cond_embed_dim=10,
    encoder_hidden_size=8,
    vocab_size=32,
    codebook_size=32,
    in_channels=8,
    block_out_channels=8,
    num_res_blocks=1,
    downsample=True,
    upsample=True,
    block_num_heads=2,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=16,
    sample_size=8,
)


def test_uvit2d_parity():
    torch = pytest.importorskip("torch")
    from diffusers import UVit2DModel as TorchUVit

    tm = TorchUVit(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = UVit2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 32, size=(1, 8, 8)).astype(np.int64)
    ctx = rng.randn(1, 6, 8).astype(np.float32)
    pooled = rng.randn(1, 8).astype(np.float32)
    micro = rng.rand(1, 5).astype(np.float32) * 100

    with torch.no_grad():
        ref = tm(torch.from_numpy(ids), torch.from_numpy(ctx), torch.from_numpy(pooled),
                 torch.from_numpy(micro)).numpy()
    ours = np.asarray(m(params, jnp.asarray(ids), jnp.asarray(ctx), jnp.asarray(pooled),
                        jnp.asarray(micro)))
    assert ours.shape == ref.shape
    err = np.max(np.abs(ours - ref))
    assert err < 5e-4, f"UVit2D diverges: {err}"
