"""AsymmetricAutoencoderKL parity vs the torch reference."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_asym_kl import AsymmetricAutoencoderKL
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

CFG = dict(
    in_channels=3,
    out_channels=3,
    down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
    down_block_out_channels=(32, 32),
    layers_per_down_block=1,
    up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
    up_block_out_channels=(32, 64),
    layers_per_up_block=1,
    latent_channels=4,
    norm_num_groups=32,
    sample_size=32,
)


def test_asym_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AsymmetricAutoencoderKL as TorchVAE

    tm = TorchVAE(**CFG)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AsymmetricAutoencoderKL(**CFG)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_m = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    mine_m = np.asarray(m.encode(params, jnp.asarray(x)).parameters)
    assert np.max(np.abs(mine_m - ref_m)) < 5e-5

    z = rng.randn(1, 4, 16, 16).astype(np.float32)
    image = rng.randn(1, 3, 32, 32).astype(np.float32)
    mask = (rng.rand(1, 1, 32, 32) > 0.5).astype(np.float32)
    with torch.no_grad():
        ref_d = tm.decode(torch.from_numpy(z), image=torch.from_numpy(image),
                          mask=torch.from_numpy(mask)).sample.numpy()
    mine_d = np.asarray(
        m.decode(params, jnp.asarray(z), image=jnp.asarray(image), mask=jnp.asarray(mask)).sample
    )
    assert np.max(np.abs(mine_d - ref_d)) < 5e-4, np.max(np.abs(mine_d - ref_d))

    # unconditioned decode path
    with torch.no_grad():
        ref_d2 = tm.decode(torch.from_numpy(z)).sample.numpy()
    mine_d2 = np.asarray(m.decode(params, jnp.asarray(z)).sample)
    assert np.max(np.abs(mine_d2 - ref_d2)) < 5e-4
