"""Cosmos3 AVAE audio tokenizer: SpecConvNeXt encoder + Oobleck decoder parity.

Reference: `/root/reference/src/diffusers/models/autoencoders/autoencoder_cosmos3_audio.py:374`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu import Cosmos3AVAEAudioTokenizer
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    vocoder_input_dim=4,
    dec_dim=8,
    dec_c_mults=(1, 2),
    dec_strides=(2, 4),
    dec_out_channels=2,
    stereo=True,
    enc_dim=8,
    enc_num_blocks=1,
    enc_n_fft=16,
    enc_hop_length=4,
    enc_latent_dim=8,
    enc_c_mults=(1, 2),
    enc_strides=(2, 2),
)


@pytest.mark.refparity
def test_cosmos3_audio_parity():
    torch = pytest.importorskip("torch")
    from diffusers.models.autoencoders.autoencoder_cosmos3_audio import (
        Cosmos3AVAEAudioTokenizer as TorchAVAE,
    )

    tm = TorchAVAE(**TINY)
    tm.eval()
    with torch.no_grad():  # zero snake alphas degenerate; randomize
        for n, p in tm.named_parameters():
            if (p == 0).all():
                p.data.normal_(0.0, 0.1)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = Cosmos3AVAEAudioTokenizer(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    wav = (rng.rand(1, 2, 320).astype(np.float32) * 2 - 1)
    with torch.no_grad():
        post_ref = tm.encode(torch.from_numpy(wav), force_pad=True).latent_dist
        mean_ref = post_ref.mean.numpy()
        dec_ref = tm.decode(post_ref.mean).numpy()
    post = m.encode(params, jnp.asarray(wav), force_pad=True).latent_dist
    mean = np.asarray(post.mean)
    assert mean.shape == mean_ref.shape
    d = np.max(np.abs(mean - mean_ref))
    assert d < 5e-3, f"encode delta {d}"
    dec = np.asarray(m.decode(params, jnp.asarray(mean)))
    assert dec.shape == dec_ref.shape
    d = np.max(np.abs(dec - dec_ref))
    assert d < 5e-3, f"decode delta {d}"


def test_cosmos3_audio_roundtrip_shapes():
    m = Cosmos3AVAEAudioTokenizer(**TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    wav = jnp.asarray(np.random.RandomState(0).rand(2, 2, 160) * 2 - 1, jnp.float32)
    post = m.encode(params, wav).latent_dist
    assert post.mean.shape[1] == TINY["enc_latent_dim"] // 2
    audio = m.decode(params, post.mode()[:, :TINY["vocoder_input_dim"]])
    assert audio.shape[0] == 2 and audio.shape[1] == 2
    assert np.isfinite(np.asarray(audio)).all()
    assert np.abs(np.asarray(audio)).max() <= 1.0
