"""AutoencoderKLHunyuanVideo parity vs torch reference (tiny config)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl_hunyuan_video import AutoencoderKLHunyuanVideo
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    in_channels=3,
    out_channels=3,
    latent_channels=4,
    block_out_channels=(8, 8, 8, 8),
    layers_per_block=1,
    norm_num_groups=4,
    temporal_compression_ratio=4,
    spatial_compression_ratio=8,
    mid_block_add_attention=True,
)


@pytest.mark.refparity
def test_hunyuan_video_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKLHunyuanVideo as TorchVAE

    tm = TorchVAE(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLHunyuanVideo(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 5, 16, 16).astype(np.float32)  # 5 frames -> 2 latent frames
    with torch.no_grad():
        ref_moments = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    post = m.encode(params, jnp.asarray(x))
    ours = np.asarray(post.parameters)
    assert ours.shape == ref_moments.shape
    assert np.max(np.abs(ours - ref_moments)) < 5e-4, np.max(np.abs(ours - ref_moments))

    z = post.mode()
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(np.asarray(z))).sample.numpy()
    dec = np.asarray(m.decode(params, z).sample)
    assert dec.shape == ref_dec.shape
    assert np.max(np.abs(dec - ref_dec)) < 5e-3, np.max(np.abs(dec - ref_dec))
