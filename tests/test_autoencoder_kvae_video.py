"""Kandinsky causal video VAE: chunked cached encode/decode parity.

Reference: `/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_kvae_video.py:707`.
The functional-cache chunking must reproduce the torch dict-cache chunking
exactly — including multi-chunk runs where the temporal caches carry across
segment boundaries.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu import AutoencoderKLKVAEVideo
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, in_channels=3, out_ch=3,
            z_channels=4, temporal_compress_times=2)


@pytest.mark.refparity
def test_kvae_video_parity_multichunk():
    torch = pytest.importorskip("torch")
    from diffusers.models.autoencoders.autoencoder_kl_kvae_video import (
        AutoencoderKLKVAEVideo as TorchKVAE,
    )

    tm = TorchKVAE(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLKVAEVideo(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    # 9 frames with seg_len=4 → chunks [5, 4]: exercises the cache carry
    x = (rng.rand(1, 3, 9, 16, 16).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        z_ref = tm._encode(torch.from_numpy(x), seg_len=4).numpy()
        dec_ref = tm._decode(torch.from_numpy(z_ref), seg_len=4).numpy()
    post = m.encode(params, jnp.asarray(x), seg_len=4).latent_dist
    z = np.asarray(post.mode())
    assert z.shape == z_ref.shape, (z.shape, z_ref.shape)
    d = np.max(np.abs(z - z_ref))
    assert d < 2e-3, f"encode delta {d}"
    dec = np.asarray(m.decode(params, jnp.asarray(z_ref), seg_len=4).sample)
    assert dec.shape == dec_ref.shape, (dec.shape, dec_ref.shape)
    d = np.max(np.abs(dec - dec_ref))
    assert d < 5e-3, f"decode delta {d}"


def test_kvae_video_roundtrip_shapes():
    m = AutoencoderKLKVAEVideo(**TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 5, 16, 16), jnp.float32)
    z = m.encode(params, x).latent_dist.mode()
    # temporal compress 2 causal: 1 + (5-1)/2 = 3 latent frames; spatial /2
    assert z.shape == (1, 4, 3, 8, 8), z.shape
    dec = m.decode(params, z).sample
    assert dec.shape == (1, 3, 5, 16, 16), dec.shape
    assert np.isfinite(np.asarray(dec)).all()
