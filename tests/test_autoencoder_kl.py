"""AutoencoderKL parity vs torch reference (tiny config, mirrors
`tests/models/autoencoders/test_models_autoencoder_kl.py`)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    in_channels=3,
    out_channels=3,
    block_out_channels=(32, 64),
    down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
    up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
    latent_channels=4,
    layers_per_block=1,
    norm_num_groups=32,
    sample_size=32,
)


def test_encode_decode_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKL as TorchVAE

    tm = TorchVAE(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKL(**TINY)
    params = convert_torch_state_dict(m, sd)

    x = np.random.RandomState(0).randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_moments = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    post = m.encode(params, jnp.asarray(x))
    moments = np.asarray(post.parameters)
    assert np.max(np.abs(moments - ref_moments)) < 5e-5, np.max(np.abs(moments - ref_moments))

    z = np.random.RandomState(1).randn(1, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(z)).sample.numpy()
    dec = np.asarray(m.decode(params, jnp.asarray(z)).sample)
    assert np.max(np.abs(dec - ref_dec)) < 5e-5, np.max(np.abs(dec - ref_dec))


def test_sample_and_mode():
    m = AutoencoderKL(**TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    x = jnp.ones((1, 3, 32, 32))
    post = m.encode(params, x)
    assert post.mode().shape == (1, 4, 16, 16)
    s = post.sample(jax.random.PRNGKey(1))
    assert s.shape == (1, 4, 16, 16)


def test_tiled_decode_matches_plain_on_small_input():
    m = AutoencoderKL(**TINY)
    m.tile_latent_min_size = 8
    m.tile_sample_min_size = 16
    params = m.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 16, 16))
    plain = np.asarray(m.decode(params, z).sample)
    tiled = np.asarray(m.tiled_decode(params, z).sample)
    assert plain.shape == tiled.shape
    # interior should be close; seams are blended so allow loose tolerance
    assert np.abs(plain - tiled).mean() < 0.5
