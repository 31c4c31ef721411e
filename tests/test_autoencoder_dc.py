"""AutoencoderDC (Sana deep-compression VAE): torch parity on encode/decode,
covering ResBlock + EfficientViTBlock (multiscale linear attention) paths."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

torch = pytest.importorskip("torch")


def _tiny_pair():
    from diffusers import AutoencoderDC as TorchDC

    from diffusers_tpu.models.autoencoders.autoencoder_dc import AutoencoderDC
    from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

    cfg = dict(
        in_channels=3, latent_channels=4, attention_head_dim=8,
        encoder_block_types=("ResBlock", "EfficientViTBlock"),
        decoder_block_types=("ResBlock", "EfficientViTBlock"),
        encoder_block_out_channels=(16, 32), decoder_block_out_channels=(16, 32),
        encoder_layers_per_block=(1, 1), decoder_layers_per_block=(1, 1),
        encoder_qkv_multiscales=((), (3,)), decoder_qkv_multiscales=((), (3,)),
    )
    torch.manual_seed(0)
    ref = TorchDC(**cfg).eval()
    ours = AutoencoderDC(**cfg)
    params = convert_torch_state_dict(ours, {k: v.numpy() for k, v in ref.state_dict().items()})
    return ref, ours, params


def test_dc_ae_encode_parity():
    ref, ours, params = _tiny_pair()
    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_lat = ref.encode(torch.from_numpy(x)).latent.numpy()
    lat = np.asarray(ours.encode(params, jnp.asarray(x)).latent)
    assert lat.shape == ref_lat.shape
    assert np.max(np.abs(lat - ref_lat)) < 5e-4, np.max(np.abs(lat - ref_lat))


def test_dc_ae_decode_parity():
    ref, ours, params = _tiny_pair()
    z = np.random.RandomState(1).randn(1, 4, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref_dec = ref.decode(torch.from_numpy(z)).sample.numpy()
    dec = np.asarray(ours.decode(params, jnp.asarray(z)).sample)
    assert dec.shape == ref_dec.shape
    assert np.max(np.abs(dec - ref_dec)) < 5e-4, np.max(np.abs(dec - ref_dec))


def test_dc_ae_roundtrip_parity():
    ref, ours, params = _tiny_pair()
    x = np.random.RandomState(2).randn(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).sample.numpy()
    out = np.asarray(ours(params, jnp.asarray(x)).sample)
    assert np.max(np.abs(out - ref_out)) < 1e-3, np.max(np.abs(out - ref_out))
