"""ConsistencyDecoderVAE parity vs torch reference (tiny config).

Reference: models/autoencoders/consistency_decoder_vae.py:52 (encode :186,
decode :233) + schedulers/scheduling_consistency_decoder.py:80.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.consistency_decoder_vae import ConsistencyDecoderVAE
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    latent_channels=4,
    sample_size=16,
    encoder_block_out_channels=(8, 8),
    encoder_down_block_types=("DownEncoderBlock2D",) * 2,
    encoder_layers_per_block=1,
    encoder_norm_num_groups=4,
    decoder_block_out_channels=(8, 16),
    decoder_down_block_types=("ResnetDownsampleBlock2D",) * 2,
    decoder_up_block_types=("ResnetUpsampleBlock2D",) * 2,
    decoder_layers_per_block=1,
    decoder_norm_num_groups=4,
    decoder_in_channels=7,
    decoder_out_channels=6,
)


def test_consistency_decoder_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import ConsistencyDecoderVAE as TorchCDVAE

    tm = TorchCDVAE(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = ConsistencyDecoderVAE(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 16, 16).astype(np.float32)

    # encode parity (deterministic)
    with torch.no_grad():
        ref_moments = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    ours_moments = np.asarray(m.encode(params, jnp.asarray(x)).latent_dist.parameters)
    assert ours_moments.shape == ref_moments.shape
    err = np.max(np.abs(ours_moments - ref_moments))
    assert err < 5e-4, f"encode moments diverge: {err}"

    # decode parity with pinned noise: replicate the reference decode loop
    # by hand with the same numpy noise we inject into ours
    z = ref_moments[:, : ref_moments.shape[1] // 2]
    scale = 2 ** (len(TINY["encoder_block_out_channels"]) - 1)
    h = w = 16 // scale
    initial = rng.randn(1, 3, h * scale, w * scale).astype(np.float32)
    variance = rng.randn(2, 1, 3, h * scale, w * scale).astype(np.float32)

    with torch.no_grad():
        zt = torch.from_numpy(z)
        zt = (zt * tm.config.scaling_factor - tm.means) / tm.stds
        zt = torch.nn.functional.interpolate(zt, mode="nearest", scale_factor=scale)
        tm.decoder_scheduler.set_timesteps(2)
        x_t = tm.decoder_scheduler.init_noise_sigma * torch.from_numpy(initial)
        for i, t in enumerate(tm.decoder_scheduler.timesteps):
            model_input = torch.concat([tm.decoder_scheduler.scale_model_input(x_t, t), zt], dim=1)
            model_output = tm.decoder_unet(model_input, t).sample[:, :3, :, :]
            # reference step: x_0 then renoise (except last step)
            sched = tm.decoder_scheduler
            x_0 = sched.c_out[t] * model_output + sched.c_skip[t] * x_t
            if i == len(sched.timesteps) - 1:
                x_t = x_0
            else:
                next_t = sched.timesteps[i + 1]
                noise = torch.from_numpy(variance[i])
                x_t = sched.sqrt_alphas_cumprod[next_t] * x_0 + sched.sqrt_one_minus_alphas_cumprod[next_t] * noise
        ref_dec = x_t.numpy()

    ours_dec = np.asarray(
        m.decode(params, jnp.asarray(z), initial_noise=jnp.asarray(initial),
                 variance_noise=jnp.asarray(variance)).sample
    )
    assert ours_dec.shape == ref_dec.shape
    err = np.max(np.abs(ours_dec - ref_dec))
    assert err < 5e-3, f"decode diverges: {err}"


def test_consistency_decoder_vae_prng_decode_runs():
    m = ConsistencyDecoderVAE(**TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    z = jnp.asarray(np.random.RandomState(1).randn(1, 4, 8, 8), jnp.float32)
    out = m.decode(params, z, key=jax.random.PRNGKey(2)).sample
    assert out.shape == (1, 3, 16, 16)
    assert np.isfinite(np.asarray(out)).all()
