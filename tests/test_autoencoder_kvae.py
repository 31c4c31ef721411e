"""Kandinsky KVAE: PixelShuffle-hybrid resampling + zq-spatial-norm parity.

Reference: `/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_kvae.py:521`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu import AutoencoderKLKVAE
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(in_channels=3, channels=32, num_enc_blocks=1, num_dec_blocks=1,
            z_channels=4, ch_mult=(1, 2), sample_size=32)


@pytest.mark.refparity
def test_kvae_parity():
    torch = pytest.importorskip("torch")
    from diffusers.models.autoencoders.autoencoder_kl_kvae import AutoencoderKLKVAE as TorchKVAE

    tm = TorchKVAE(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLKVAE(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    with torch.no_grad():
        post = tm.encode(torch.from_numpy(x)).latent_dist
        z_ref = post.mode().numpy()
        dec_ref = tm.decode(torch.from_numpy(z_ref)).sample.numpy()
    z = np.asarray(m.encode(params, jnp.asarray(x)).latent_dist.mode())
    assert z.shape == z_ref.shape
    d = np.max(np.abs(z - z_ref))
    assert d < 2e-3, f"encode delta {d}"
    dec = np.asarray(m.decode(params, jnp.asarray(z_ref)).sample)
    assert dec.shape == dec_ref.shape
    d = np.max(np.abs(dec - dec_ref))
    assert d < 2e-3, f"decode delta {d}"


def test_kvae_roundtrip_shapes():
    m = AutoencoderKLKVAE(**TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 32, 32), jnp.float32)
    z = m.encode(params, x).latent_dist.mode()
    assert z.shape == (2, 4, 16, 16)  # one downsample (2 levels)
    out = m(params, x, sample_posterior=True, key=jax.random.PRNGKey(1)).sample
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
