"""AutoencoderKLCogVideoX parity vs torch reference (tiny config)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl_cogvideox import AutoencoderKLCogVideoX
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    in_channels=3,
    out_channels=3,
    down_block_types=("CogVideoXDownBlock3D",) * 3,
    up_block_types=("CogVideoXUpBlock3D",) * 3,
    block_out_channels=(8, 8, 8),
    latent_channels=4,
    layers_per_block=1,
    norm_num_groups=4,
    temporal_compression_ratio=2,
)


def test_cogvideox_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKLCogVideoX as TorchVAE

    tm = TorchVAE(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLCogVideoX(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 5, 16, 16).astype(np.float32)  # [B, C, T, H, W], odd frames

    with torch.no_grad():
        ref_moments = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    ours = m.encode(params, jnp.asarray(x)).parameters
    assert ours.shape == ref_moments.shape
    err = np.max(np.abs(np.asarray(ours) - ref_moments))
    assert err < 5e-4, f"encode err {err}"

    z = rng.randn(*ref_moments[:, :4].shape).astype(np.float32)
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(z)).sample.numpy()
    dec = np.asarray(m.decode(params, jnp.asarray(z)).sample)
    assert dec.shape == ref_dec.shape
    err = np.max(np.abs(dec - ref_dec))
    assert err < 5e-3, f"decode err {err}"


def test_cogvideox_vae_roundtrip_smoke():
    m = AutoencoderKLCogVideoX(**TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(1).randn(1, 3, 3, 16, 16), jnp.float32)
    dist = m.encode(params, x)
    # 3 frames / temporal_compression 2 → 2 latent frames (first frame kept)
    assert dist.mean.shape == (1, 4, 2, 4, 4)  # 2 spatial downsamples (3 blocks)
    out = m.decode(params, dist.mode()).sample
    assert out.shape == (1, 3, 4, 16, 16)  # even latent T upsamples to 2T frames (reference semantics)
    assert np.isfinite(np.asarray(out)).all()
