"""Parity for the round-3 facade-closure VAEs: QwenImage (Wan-derived),
Flux2 (KL + latent BatchNorm stats), Magvit (EasyAnimate causal video VAE) —
our full-sequence formulations vs the reference's chunked/stateful ones."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")


def test_qwenimage_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKLQwenImage as TorchVAE

    from diffusers_tpu.models.autoencoders.autoencoder_kl_qwenimage import AutoencoderKLQwenImage

    cfg = dict(base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1,
               attn_scales=[], temperal_downsample=[False, True])
    tm = TorchVAE(**cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLQwenImage(**cfg)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 5, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_moments = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    moments = np.asarray(m.encode(params, jnp.asarray(x)).parameters)
    assert moments.shape == ref_moments.shape
    assert np.max(np.abs(moments - ref_moments)) < 2e-4

    z = rng.randn(1, 4, 2, 4, 4).astype(np.float32)
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(z)).sample.numpy()
    dec = np.asarray(m.decode(params, jnp.asarray(z)).sample)
    assert dec.shape == ref_dec.shape
    assert np.max(np.abs(dec - ref_dec)) < 2e-4


def test_flux2_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKLFlux2 as TorchVAE

    from diffusers_tpu.models.autoencoders.autoencoder_kl_flux2 import AutoencoderKLFlux2

    cfg = dict(
        block_out_channels=(16, 32),
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
        latent_channels=8,
        norm_num_groups=8,
        layers_per_block=1,
        sample_size=64,
    )
    tm = TorchVAE(**cfg)
    tm.eval()
    # give the bn stats non-trivial values (checkpoints carry trained stats)
    with torch.no_grad():
        tm.bn.running_mean.uniform_(-0.5, 0.5)
        tm.bn.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLFlux2(**cfg)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_moments = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    moments = np.asarray(m.encode(params, jnp.asarray(x)).parameters)
    assert np.max(np.abs(moments - ref_moments)) < 2e-4

    z = rng.randn(1, 8, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(z)).sample.numpy()
    dec = np.asarray(m.decode(params, jnp.asarray(z)).sample)
    assert np.max(np.abs(dec - ref_dec)) < 2e-4

    # bn stats surface exactly as the Flux2 pipelines consume them
    mean, std = m.latent_distribution_stats(params)
    ref_mean = tm.bn.running_mean.numpy()
    ref_std = np.sqrt(tm.bn.running_var.numpy() + tm.config.batch_norm_eps)
    assert np.allclose(np.asarray(mean), ref_mean, atol=1e-6)
    assert np.allclose(np.asarray(std), ref_std, atol=1e-6)


def test_cosmos_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKLCosmos as TorchVAE

    from diffusers_tpu.models.autoencoders.autoencoder_kl_cosmos import AutoencoderKLCosmos

    cfg = dict(
        in_channels=3,
        out_channels=3,
        latent_channels=4,
        encoder_block_out_channels=(8, 16, 16, 16),
        decode_block_out_channels=(8, 16, 16, 16),
        attention_resolutions=(4,),
        resolution=16,
        num_layers=1,
        patch_size=2,
        patch_type="haar",
        spatial_compression_ratio=4,
        temporal_compression_ratio=4,
        latents_mean=None,
        latents_std=None,
    )
    tm = TorchVAE(**cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLCosmos(**cfg)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 5, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_latent = tm.encode(torch.from_numpy(x)).latent_dist.mode().numpy()
    latent = np.asarray(m.encode(params, jnp.asarray(x)).mode())
    assert latent.shape == ref_latent.shape, (latent.shape, ref_latent.shape)
    assert np.max(np.abs(latent - ref_latent)) < 5e-4, np.max(np.abs(latent - ref_latent))

    z = rng.randn(*ref_latent.shape).astype(np.float32)
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(z)).sample.numpy()
    dec = np.asarray(m.decode(params, jnp.asarray(z)).sample)
    assert dec.shape == ref_dec.shape, (dec.shape, ref_dec.shape)
    assert np.max(np.abs(dec - ref_dec)) < 5e-4, np.max(np.abs(dec - ref_dec))


def test_allegro_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKLAllegro as TorchVAE

    from diffusers_tpu.models.autoencoders.autoencoder_kl_allegro import AutoencoderKLAllegro

    cfg = dict(
        in_channels=3,
        out_channels=3,
        down_block_types=("AllegroDownBlock3D", "AllegroDownBlock3D"),
        up_block_types=("AllegroUpBlock3D", "AllegroUpBlock3D"),
        block_out_channels=(8, 16),
        temporal_downsample_blocks=(True, False),
        temporal_upsample_blocks=(False, True),
        latent_channels=4,
        layers_per_block=1,
        norm_num_groups=8,
        temporal_compression_ratio=2,
        sample_size=32,
    )
    tm = TorchVAE(**cfg)
    tm.eval()
    tm.enable_tiling()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLAllegro(**cfg)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 24, 32, 32).astype(np.float32)  # exactly one tile
    with torch.no_grad():
        ref_moments = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    moments = np.asarray(m.encode(params, jnp.asarray(x)).parameters)
    assert moments.shape == ref_moments.shape, (moments.shape, ref_moments.shape)
    assert np.max(np.abs(moments - ref_moments)) < 5e-4, np.max(np.abs(moments - ref_moments))

    z = rng.randn(1, 4, 12, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(z)).sample.numpy()
    dec = np.asarray(m.decode(params, jnp.asarray(z)).sample)
    assert dec.shape == ref_dec.shape, (dec.shape, ref_dec.shape)
    assert np.max(np.abs(dec - ref_dec)) < 5e-4, np.max(np.abs(dec - ref_dec))


def test_magvit_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKLMagvit as TorchVAE

    from diffusers_tpu.models.autoencoders.autoencoder_kl_magvit import AutoencoderKLMagvit

    cfg = dict(
        in_channels=3,
        latent_channels=4,
        out_channels=3,
        block_out_channels=(8, 16, 16),
        down_block_types=("SpatialDownBlock3D", "SpatialTemporalDownBlock3D", "SpatialTemporalDownBlock3D"),
        up_block_types=("SpatialUpBlock3D", "SpatialTemporalUpBlock3D", "SpatialTemporalUpBlock3D"),
        layers_per_block=1,
        norm_num_groups=8,
        spatial_group_norm=True,
    )
    tm = TorchVAE(**cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLMagvit(**cfg)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    # 1 + 4k frames (EasyAnimate convention), 3 levels → /4 spatial, /4 temporal
    x = rng.randn(1, 3, 5, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_moments = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    moments = np.asarray(m.encode(params, jnp.asarray(x)).parameters)
    assert moments.shape == ref_moments.shape, (moments.shape, ref_moments.shape)
    assert np.max(np.abs(moments - ref_moments)) < 2e-4, np.max(np.abs(moments - ref_moments))

    z = rng.randn(1, 4, 2, 4, 4).astype(np.float32)
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(z)).sample.numpy()
    dec = np.asarray(m.decode(params, jnp.asarray(z)).sample)
    assert dec.shape == ref_dec.shape, (dec.shape, ref_dec.shape)
    assert np.max(np.abs(dec - ref_dec)) < 2e-4, np.max(np.abs(dec - ref_dec))
