"""UNetSpatioTemporalConditionModel + AutoencoderKLTemporalDecoder parity vs
the torch reference (SVD family)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl_temporal_decoder import AutoencoderKLTemporalDecoder
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.unets.unet_spatio_temporal_condition import UNetSpatioTemporalConditionModel

sys.path.insert(0, "/root/reference/src")

SVD_TINY = dict(
    sample_size=16,
    in_channels=8,
    out_channels=4,
    down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
    up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
    block_out_channels=(32, 64),
    layers_per_block=2,
    num_attention_heads=(2, 4),
    cross_attention_dim=32,
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=24,
    num_frames=4,
)


def test_svd_unet_parity():
    torch = pytest.importorskip("torch")
    from diffusers import UNetSpatioTemporalConditionModel as TorchUNet

    tm = TorchUNet(**SVD_TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = UNetSpatioTemporalConditionModel(**SVD_TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 8, 16, 16).astype(np.float32)  # [B, F, C, H, W]
    ehs = rng.randn(2, 1, 32).astype(np.float32)
    tids = rng.randn(2, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), 5, torch.from_numpy(ehs), torch.from_numpy(tids)).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), 5, jnp.asarray(ehs), jnp.asarray(tids)).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-5, np.max(np.abs(out - ref))


def test_temporal_decoder_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKLTemporalDecoder as TorchVAE

    cfg = dict(
        in_channels=3,
        out_channels=3,
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
        block_out_channels=(32, 64),
        layers_per_block=1,
        latent_channels=4,
        sample_size=32,
    )
    tm = TorchVAE(**cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLTemporalDecoder(**cfg)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_moments = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    moments = np.asarray(m.encode(params, jnp.asarray(x)).parameters)
    assert np.max(np.abs(moments - ref_moments)) < 5e-5

    z = rng.randn(4, 4, 8, 8).astype(np.float32)  # 2 videos x 2 frames
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(z), num_frames=2).sample.numpy()
    dec = np.asarray(m.decode(params, jnp.asarray(z), num_frames=2).sample)
    assert np.max(np.abs(dec - ref_dec)) < 5e-5, np.max(np.abs(dec - ref_dec))
