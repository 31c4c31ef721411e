"""MiniMax-H3 audio VAE parity: DAC encoder + causal-attention projection
(mean-pooled heads, adaptive pool) + BigVGAN AMP decoder.

Reference: `/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_minimax_h3_audio.py:488`.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl_minimax_h3_audio import (
    AutoencoderKLMiniMaxH3Audio,
)
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    encoder_dim=4,
    encoder_rates=(2, 2),
    latent_dim=16,
    latent_channels=4,
    num_attention_heads=2,
    decoder_dim=8,
    decoder_rates=(2, 2),
    decoder_kernel_sizes=(4, 4),
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)


@pytest.mark.refparity
def test_minimax_h3_audio_roundtrip_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKLMiniMaxH3Audio as TorchModel

    torch.manual_seed(0)
    tm = TorchModel(**TINY).eval()
    m = AutoencoderKLMiniMaxH3Audio(**TINY)
    params = convert_torch_state_dict(m, {k: v.detach().numpy() for k, v in tm.state_dict().items()})

    # 100 samples: not a hop multiple → exercises the right-pad
    wav = (np.random.RandomState(0).rand(2, 1, 100).astype(np.float32) * 2 - 1) * 0.5
    with torch.no_grad():
        ref_lat = tm.encode(torch.from_numpy(wav)).latent_dist.mode()
        ref_dec = tm.decode(ref_lat).sample.numpy()
        ref_lat = ref_lat.numpy()

    lat = m.encode(params, jnp.asarray(wav)).latent_dist.mode()
    dec = np.asarray(m.decode(params, lat).sample)
    lat = np.asarray(lat)

    assert lat.shape == ref_lat.shape
    assert np.max(np.abs(lat - ref_lat)) < 5e-4, np.max(np.abs(lat - ref_lat))
    assert dec.shape == ref_dec.shape
    assert np.max(np.abs(dec - ref_dec)) < 5e-4, np.max(np.abs(dec - ref_dec))
