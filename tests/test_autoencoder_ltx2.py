"""AutoencoderKLLTX2Video parity vs torch reference (tiny configs)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl_ltx2 import AutoencoderKLLTX2Video
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

# LTX2-shaped tiny config: per-block downsample types, plain conv shortcuts,
# reflect-padded residual decoder with upscale factor 2
TINY = dict(
    in_channels=3,
    out_channels=3,
    latent_channels=8,
    block_out_channels=(8, 16, 16),
    decoder_block_out_channels=(16, 32),
    layers_per_block=(1, 1, 1, 1),
    decoder_layers_per_block=(1, 1, 1),
    spatio_temporal_scaling=(True, True, True),
    decoder_spatio_temporal_scaling=(False, True),
    decoder_inject_noise=(False, False, False),
    downsample_type=("spatial", "temporal", "spatiotemporal"),
    upsample_type=("spatial", "spatiotemporal"),
    upsample_residual=(False, True),
    upsample_factor=(1, 2),
    timestep_conditioning=False,
    patch_size=2,
    patch_size_t=1,
    encoder_causal=True,
    decoder_causal=True,
    encoder_spatial_padding_mode="zeros",
    decoder_spatial_padding_mode="reflect",
)


def _roundtrip(config, frames=5, size=16, temb=None):
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKLLTX2Video as TorchVAE

    tconfig = dict(config)
    tconfig["down_block_types"] = ("LTX2VideoDownBlock3D",) * len(config["block_out_channels"])
    tm = TorchVAE(**tconfig)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLLTX2Video(**config)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, frames, size, size).astype(np.float32)

    with torch.no_grad():
        ref_moments = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    ours_moments = np.asarray(m.encode(params, jnp.asarray(x)).latent_dist.parameters)
    assert ours_moments.shape == ref_moments.shape
    err = np.max(np.abs(ours_moments - ref_moments))
    assert err < 5e-4, f"encode moments diverge: {err}"

    z = ref_moments[:, : ref_moments.shape[1] // 2]
    targs = {}
    oargs = {}
    if temb is not None:
        targs["temb"] = torch.from_numpy(temb)
        oargs["temb"] = jnp.asarray(temb)
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(z), **targs).sample.numpy()
    ours_dec = np.asarray(m.decode(params, jnp.asarray(z), **oargs).sample)
    assert ours_dec.shape == ref_dec.shape
    err = np.max(np.abs(ours_dec - ref_dec))
    assert err < 5e-3, f"decode diverges: {err}"


def test_ltx2_vae_parity():
    _roundtrip(TINY)


def test_ltx2_vae_parity_timestep_conditioned():
    cfg = dict(TINY)
    cfg["timestep_conditioning"] = True
    _roundtrip(cfg, temb=np.array([0.05], dtype=np.float32))
