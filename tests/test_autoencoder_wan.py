"""AutoencoderKLWan parity: our full-sequence causal-conv formulation vs the
reference's chunked cache recursion (they must be mathematically identical)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    base_dim=16,
    z_dim=4,
    dim_mult=[1, 2],
    num_res_blocks=1,
    attn_scales=[],
    temperal_downsample=[False, True],
)


def test_wan_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKLWan as TorchWanVAE

    tm = TorchWanVAE(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLWan(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    # 1 + 4k frames (Wan video convention)
    x = rng.randn(1, 3, 5, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_moments = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    post = m.encode(params, jnp.asarray(x))
    moments = np.asarray(post.parameters)
    assert moments.shape == ref_moments.shape, (moments.shape, ref_moments.shape)
    assert np.max(np.abs(moments - ref_moments)) < 2e-4, np.max(np.abs(moments - ref_moments))

    z = rng.randn(1, 4, 2, 4, 4).astype(np.float32)
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(z)).sample.numpy()
    dec = np.asarray(m.decode(params, jnp.asarray(z)).sample)
    assert dec.shape == ref_dec.shape, (dec.shape, ref_dec.shape)
    assert np.max(np.abs(dec - ref_dec)) < 2e-4, np.max(np.abs(dec - ref_dec))
