"""AutoencoderRAE: frozen-encoder + ViT-MAE-decoder parity vs torch reference.

Reference: `/root/reference/src/diffusers/models/autoencoders/autoencoder_rae.py:393`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_rae import AutoencoderRAE
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    # the reference's encoder builder derives heads as hidden//64
    # (autoencoder_rae.py:88) — hidden must be a multiple of 64
    encoder_hidden_size=128,
    encoder_num_hidden_layers=2,
    decoder_hidden_size=32,
    decoder_num_hidden_layers=2,
    decoder_num_attention_heads=2,
    decoder_intermediate_size=64,
    patch_size=16,
    encoder_input_size=64,
    scaling_factor=1.0,
)


def _parity(encoder_type, encoder_patch_size, atol):
    torch = pytest.importorskip("torch")
    from diffusers.models.autoencoders.autoencoder_rae import AutoencoderRAE as TorchRAE

    kw = dict(TINY, encoder_type=encoder_type, encoder_patch_size=encoder_patch_size)
    tm = TorchRAE(**kw)
    tm.eval()
    with torch.no_grad():  # randomize degenerate zero tokens
        for n, p in tm.named_parameters():
            if (p == 0).all():
                p.data.normal_(0.0, 0.05)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderRAE(**kw)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        z_ref = tm.encode(torch.from_numpy(x), return_dict=False)[0].numpy()
        dec_ref = tm.decode(torch.from_numpy(z_ref), return_dict=False)[0].numpy()
    z = np.asarray(m.encode(params, jnp.asarray(x), return_dict=False)[0])
    assert z.shape == z_ref.shape
    d = np.max(np.abs(z - z_ref))
    assert d < atol, f"encode delta {d}"
    dec = np.asarray(m.decode(params, jnp.asarray(z), return_dict=False)[0])
    assert dec.shape == dec_ref.shape
    d = np.max(np.abs(dec - dec_ref))
    assert d < atol, f"decode delta {d}"


@pytest.mark.refparity
def test_rae_dinov2_parity():
    _parity("dinov2", 16, 5e-3)


@pytest.mark.refparity
def test_rae_mae_parity():
    _parity("mae", 16, 5e-3)


@pytest.mark.refparity
def test_rae_siglip2_parity():
    _parity("siglip2", 16, 5e-3)


def test_rae_roundtrip_shapes():
    m = AutoencoderRAE(encoder_type="mae", encoder_patch_size=16, **TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 64, 64), jnp.float32)
    z = m.encode(params, x).latent
    assert z.shape == (2, 128, 4, 4)  # reshape_to_2d: [B, C, sqrt(N), sqrt(N)]
    dec = m.decode(params, z).sample
    assert dec.shape == (2, 3, 64, 64)
    assert np.isfinite(np.asarray(dec)).all()
