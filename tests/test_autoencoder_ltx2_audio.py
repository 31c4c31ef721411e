"""AutoencoderKLLTX2Audio parity vs torch reference (tiny configs)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl_ltx2_audio import AutoencoderKLLTX2Audio
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

# LTX2-shaped tiny config: pixel norm + time-causal ("height") convs
TINY = dict(
    base_channels=8,
    output_channels=2,
    ch_mult=(1, 2),
    num_res_blocks=1,
    attn_resolutions=None,
    in_channels=2,
    resolution=16,
    latent_channels=4,
    norm_type="pixel",
    causality_axis="height",
    mid_block_add_attention=False,
    mel_bins=16,
    double_z=True,
)


def _roundtrip(config, time=8, mel=16):
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKLLTX2Audio as TorchVAE

    tm = TorchVAE(**config)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLLTX2Audio(**config)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(1, config["in_channels"], time, mel).astype(np.float32)

    with torch.no_grad():
        ref_moments = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    ours_moments = np.asarray(m.encode(params, jnp.asarray(x)).latent_dist.parameters)
    assert ours_moments.shape == ref_moments.shape
    err = np.max(np.abs(ours_moments - ref_moments))
    assert err < 5e-4, f"encode moments diverge: {err}"

    z = ref_moments[:, : ref_moments.shape[1] // 2]
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(z)).sample.numpy()
    ours_dec = np.asarray(m.decode(params, jnp.asarray(z)).sample)
    assert ours_dec.shape == ref_dec.shape
    err = np.max(np.abs(ours_dec - ref_dec))
    assert err < 5e-3, f"decode diverges: {err}"


def test_ltx2_audio_vae_parity():
    _roundtrip(TINY)


def test_ltx2_audio_vae_parity_group_norm_attn():
    cfg = dict(TINY)
    cfg.update(norm_type="group", causality_axis="none", base_channels=32,
               attn_resolutions=(8,), mid_block_add_attention=True)
    _roundtrip(cfg)


def test_ltx2_audio_vae_parity_width_causal():
    cfg = dict(TINY)
    cfg.update(causality_axis="width")
    _roundtrip(cfg)
