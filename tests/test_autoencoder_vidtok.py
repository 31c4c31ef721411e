"""VidTok video tokenizer: factored 2D/1D resnet + FSQ/KL bottleneck parity.

Reference: `/root/reference/src/diffusers/models/autoencoders/autoencoder_vidtok.py:938`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu import AutoencoderVidTok
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(in_channels=3, out_channels=3, ch=16, ch_mult=[1, 2], z_channels=4,
            num_res_blocks=1, spatial_ds=[0], tempo_ds=[0], spatial_us=[1], tempo_us=[1])


@pytest.mark.refparity
def test_vidtok_kl_parity():
    torch = pytest.importorskip("torch")
    from diffusers.models.autoencoders.autoencoder_vidtok import AutoencoderVidTok as TorchVidTok

    tm = TorchVidTok(**TINY, regularizer="kl", double_z=True)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderVidTok(**TINY, regularizer="kl", double_z=True)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 3, 5, 16, 16).astype(np.float32) * 2 - 1
    with torch.no_grad():
        z_ref = tm.encode(torch.from_numpy(x)).latent_dist.mode().numpy()
        dec_ref = tm.decode(torch.from_numpy(z_ref)).numpy()
    z = np.asarray(m.encode(params, jnp.asarray(x)).latent_dist.mode())
    assert z.shape == z_ref.shape, (z.shape, z_ref.shape)
    d = np.max(np.abs(z - z_ref))
    assert d < 2e-3, f"encode delta {d}"
    dec = np.asarray(m.decode(params, jnp.asarray(z_ref)))
    assert dec.shape == dec_ref.shape, (dec.shape, dec_ref.shape)
    d = np.max(np.abs(dec - dec_ref))
    assert d < 5e-3, f"decode delta {d}"


@pytest.mark.refparity
def test_vidtok_fsq_parity():
    torch = pytest.importorskip("torch")
    from diffusers.models.autoencoders.autoencoder_vidtok import AutoencoderVidTok as TorchVidTok

    kw = dict(TINY, z_channels=4, regularizer="fsq", codebook_size=8**4, double_z=False)
    tm = TorchVidTok(**kw)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderVidTok(**kw)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(1)
    x = rng.rand(1, 3, 3, 16, 16).astype(np.float32) * 2 - 1
    with torch.no_grad():
        qz_ref, idx_ref = tm.encode(torch.from_numpy(x))
        qz_ref, idx_ref = qz_ref.numpy(), idx_ref.numpy()
    qz, idx = m.encode(params, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)
    d = np.max(np.abs(np.asarray(qz) - qz_ref))
    assert d < 2e-3, f"fsq quantized delta {d}"
    # indices round-trip through the implicit codebook
    codes = m.regularization.indices_to_codes({}, jnp.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(codes), qz_ref, atol=2e-3)


def test_vidtok_roundtrip_shapes():
    m = AutoencoderVidTok(**TINY, regularizer="kl", double_z=True)
    params = m.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 5, 16, 16), jnp.float32)
    z = m.encode(params, x).latent_dist.mode()
    dec = m.decode(params, z)
    assert dec.shape[0] == 1 and dec.shape[1] == 3
    assert np.isfinite(np.asarray(dec)).all()
