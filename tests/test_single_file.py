"""Single-file (LDM) loader tests.

Oracle: the reference repo's diffusers→original conversion script
(`scripts/convert_diffusers_to_original_stable_diffusion.py`) produces an
LDM-layout state dict from a tiny diffusers torch model; our ldm→diffusers
converter must invert it exactly.
"""

import importlib.util
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")


def _load_ref_script():
    spec = importlib.util.spec_from_file_location(
        "conv_script", "/root/reference/scripts/convert_diffusers_to_original_stable_diffusion.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


UNET_CFG = dict(
    sample_size=16,
    in_channels=4,
    out_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    block_out_channels=(32, 64),
    layers_per_block=2,
    attention_head_dim=8,
    cross_attention_dim=32,
    norm_num_groups=32,
)

# real SD VAEs are 4-block; the LDM layout (and the reference script) assume it
VAE_CFG = dict(
    in_channels=3,
    out_channels=3,
    block_out_channels=(32, 32, 64, 64),
    down_block_types=("DownEncoderBlock2D",) * 4,
    up_block_types=("UpDecoderBlock2D",) * 4,
    latent_channels=4,
    layers_per_block=1,
    norm_num_groups=32,
)


def test_unet_ldm_roundtrip():
    torch = pytest.importorskip("torch")
    from diffusers import UNet2DConditionModel as TorchUNet

    from diffusers_tpu.loaders.single_file import convert_ldm_unet_state_dict

    mod = _load_ref_script()
    tm = TorchUNet(**UNET_CFG)
    diffusers_sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    ldm_sd = mod.convert_unet_state_dict({k: torch.from_numpy(v) for k, v in diffusers_sd.items()})
    ldm_sd = {f"model.diffusion_model.{k}": v.numpy() for k, v in ldm_sd.items()}

    recovered = convert_ldm_unet_state_dict(ldm_sd, UNET_CFG)
    missing = set(diffusers_sd) - set(recovered)
    extra = set(recovered) - set(diffusers_sd)
    assert not missing, sorted(missing)[:8]
    assert not extra, sorted(extra)[:8]
    for k in diffusers_sd:
        np.testing.assert_array_equal(recovered[k], diffusers_sd[k], err_msg=k)


def test_vae_ldm_roundtrip():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKL as TorchVAE

    from diffusers_tpu.loaders.single_file import convert_ldm_vae_state_dict

    mod = _load_ref_script()
    tm = TorchVAE(**VAE_CFG)
    diffusers_sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    ldm_sd = mod.convert_vae_state_dict({k: torch.from_numpy(v) for k, v in diffusers_sd.items()})
    ldm_sd = {f"first_stage_model.{k}": v.numpy() for k, v in ldm_sd.items()}

    recovered = convert_ldm_vae_state_dict(ldm_sd)
    missing = set(diffusers_sd) - set(recovered)
    extra = set(recovered) - set(diffusers_sd)
    assert not missing, sorted(missing)[:8]
    assert not extra, sorted(extra)[:8]
    for k in diffusers_sd:
        # the reference script reshapes attention 1x1 weights; ours squeezes back
        np.testing.assert_array_equal(recovered[k].reshape(diffusers_sd[k].shape), diffusers_sd[k], err_msg=k)
