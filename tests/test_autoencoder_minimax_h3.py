"""MiniMax-H3 video VAE parity: causal CNN encoder (tiled + chunked) and
ViT decoder (register tokens, normalized-coordinate RoPE, chunk crossfade).

Reference: `/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_minimax_h3.py:501`.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl_minimax_h3 import AutoencoderKLMiniMaxH3
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    latent_channels=4,
    block_out_channels=(8, 8, 16),
    layers_per_block=1,
    spatial_downsample_factors=(2, 2, 1),
    temporal_downsample_factors=(1, 2, 1),
    norm_num_groups=4,
    decoder_num_layers=1,
    decoder_num_attention_heads=2,
    decoder_attention_head_dim=8,
    decoder_num_register_tokens=2,
    decoder_ffn_mult=2,
    decoder_rope_dim_ratio=0.75,
    clip_length=5,
    token_drop=1,
    latents_mean=(0.0,) * 4,
    latents_std=(1.0,) * 4,
)


def _models(torch, **overrides):
    from diffusers import AutoencoderKLMiniMaxH3 as TorchModel

    cfg = {**TINY, **overrides}
    torch.manual_seed(0)
    tm = TorchModel(**cfg).eval()
    m = AutoencoderKLMiniMaxH3(**cfg)
    params = convert_torch_state_dict(m, {k: v.detach().numpy() for k, v in tm.state_dict().items()})
    return tm, m, params


@pytest.mark.refparity
@pytest.mark.parametrize("tiling", [False, True])
def test_minimax_h3_vae_encode_parity(tiling):
    torch = pytest.importorskip("torch")

    tm, m, params = _models(torch)
    if not tiling:
        tm.disable_tiling()
        m.disable_tiling()
    else:
        # tiny frames: force 2 tiles with a small overlap
        tm.enable_tiling(tile_sample_min_height=12, tile_sample_min_width=12,
                         tile_sample_min_overlap_height=4, tile_sample_min_overlap_width=4)
        m.enable_tiling(tile_sample_min_height=12, tile_sample_min_width=12,
                        tile_sample_min_overlap_height=4, tile_sample_min_overlap_width=4)

    # 2 chunks of clip_length=5 → chunked + token_drop path
    x = np.random.RandomState(0).randn(1, 3, 10, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm.encode(torch.from_numpy(x)).latent_dist.mode().numpy()
    out = np.asarray(m.encode(params, jnp.asarray(x)).latent_dist.mode())
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


@pytest.mark.refparity
def test_minimax_h3_vae_decode_parity():
    torch = pytest.importorskip("torch")

    tm, m, params = _models(torch)
    tm.disable_tiling()
    m.disable_tiling()

    # 5 latent frames → multi-chunk decode with crossfade
    z = np.random.RandomState(1).randn(1, 4, 5, 4, 4).astype(np.float32)
    with torch.no_grad():
        ref = tm.decode(torch.from_numpy(z)).sample.numpy()
    out = np.asarray(m.decode(params, jnp.asarray(z)).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


@pytest.mark.refparity
def test_minimax_h3_vae_single_frame():
    torch = pytest.importorskip("torch")

    tm, m, params = _models(torch)
    tm.disable_tiling()
    m.disable_tiling()
    x = np.random.RandomState(2).randn(1, 3, 1, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm.encode(torch.from_numpy(x)).latent_dist.mode().numpy()
    out = np.asarray(m.encode(params, jnp.asarray(x)).latent_dist.mode())
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4
