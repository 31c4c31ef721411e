"""AutoencoderTiny parity vs torch reference."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_tiny import AutoencoderTiny
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    encoder_block_out_channels=(16, 16),
    decoder_block_out_channels=(16, 16),
    num_encoder_blocks=(1, 2),
    num_decoder_blocks=(2, 1),
    latent_channels=4,
)


def test_tiny_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderTiny as TorchTiny

    tm = TorchTiny(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderTiny(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = (rng.rand(1, 3, 16, 16).astype(np.float32)) * 2 - 1
    with torch.no_grad():
        ref_lat = tm.encode(torch.from_numpy(x)).latents.numpy()
    lat = np.asarray(m.encode(params, jnp.asarray(x)).latents)
    assert np.max(np.abs(lat - ref_lat)) < 5e-5, np.max(np.abs(lat - ref_lat))

    z = rng.randn(1, 4, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(z)).sample.numpy()
    dec = np.asarray(m.decode(params, jnp.asarray(z)).sample)
    assert np.max(np.abs(dec - ref_dec)) < 5e-5, np.max(np.abs(dec - ref_dec))

    # latent scale helpers
    np.testing.assert_allclose(
        np.asarray(m.unscale_latents(m.scale_latents(jnp.asarray(z[..., :2, :2])))), z[..., :2, :2], atol=1e-5
    )
