"""HunyuanImage-2.1 refiner VAE: DCAE shuffle-shortcut parity.

Reference: `/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_hunyuanimage_refiner.py:593`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu import AutoencoderKLHunyuanImageRefiner
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(in_channels=3, out_channels=3, latent_channels=4,
            block_out_channels=(16, 32, 32), layers_per_block=1,
            spatial_compression_ratio=4, temporal_compression_ratio=2)


@pytest.mark.refparity
def test_refiner_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers.models.autoencoders.autoencoder_kl_hunyuanimage_refiner import (
        AutoencoderKLHunyuanImageRefiner as TorchVAE,
    )

    tm = TorchVAE(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLHunyuanImageRefiner(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 3, 1, 16, 16).astype(np.float32) * 2 - 1  # image mode: f=1
    with torch.no_grad():
        z_ref = tm.encode(torch.from_numpy(x)).latent_dist.mode().numpy()
        dec_ref = tm.decode(torch.from_numpy(z_ref)).sample.numpy()
    z = np.asarray(m.encode(params, jnp.asarray(x)).latent_dist.mode())
    assert z.shape == z_ref.shape, (z.shape, z_ref.shape)
    d = np.max(np.abs(z - z_ref))
    assert d < 2e-3, f"encode delta {d}"
    dec = np.asarray(m.decode(params, jnp.asarray(z_ref)).sample)
    assert dec.shape == dec_ref.shape
    d = np.max(np.abs(dec - dec_ref))
    assert d < 2e-3, f"decode delta {d}"


def test_refiner_vae_shapes():
    m = AutoencoderKLHunyuanImageRefiner(**TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 1, 16, 16), jnp.float32)
    z = m.encode(params, x).latent_dist.mode()
    assert z.shape == (1, 4, 1, 4, 4), z.shape  # /4 spatial
    dec = m.decode(params, z).sample
    assert dec.shape == (1, 3, 1, 16, 16), dec.shape
    assert np.isfinite(np.asarray(dec)).all()
