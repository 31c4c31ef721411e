"""VQModel: torch-parity on encode / quantize / decode."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

torch = pytest.importorskip("torch")


def _tiny_pair():
    from diffusers import VQModel as TorchVQ

    from diffusers_tpu.models.autoencoders.vq_model import VQModel
    from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

    cfg = dict(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        block_out_channels=(32,), layers_per_block=1, latent_channels=4,
        num_vq_embeddings=16, norm_num_groups=32, vq_embed_dim=4,
    )
    torch.manual_seed(0)
    ref = TorchVQ(**cfg).eval()
    ours = VQModel(**cfg)
    params = convert_torch_state_dict(ours, {k: v.numpy() for k, v in ref.state_dict().items()})
    return ref, ours, params


def test_vq_model_roundtrip_parity():
    ref, ours, params = _tiny_pair()
    x = np.random.RandomState(0).randn(2, 3, 16, 16).astype(np.float32)

    with torch.no_grad():
        ref_lat = ref.encode(torch.from_numpy(x)).latents.numpy()
        ref_dec = ref(torch.from_numpy(x)).sample.numpy()
    lat = np.asarray(ours.encode(params, jnp.asarray(x)).latents)
    assert np.max(np.abs(lat - ref_lat)) < 5e-5

    dec = np.asarray(ours(params, jnp.asarray(x)).sample)
    assert np.max(np.abs(dec - ref_dec)) < 5e-4, np.max(np.abs(dec - ref_dec))


def test_vq_quantizer_indices_and_loss():
    ref, ours, params = _tiny_pair()
    z = np.random.RandomState(1).randn(2, 4, 4, 4).astype(np.float32)

    with torch.no_grad():
        ref_q, ref_loss, (_, _, ref_idx) = ref.quantize(torch.from_numpy(z))
    q, loss, idx = ours.quantize(params["quantize"], jnp.asarray(z))

    assert np.max(np.abs(np.asarray(q) - ref_q.numpy())) < 5e-6
    assert abs(float(loss) - float(ref_loss)) < 1e-6
    assert np.array_equal(np.sort(np.asarray(idx).reshape(-1)), np.sort(ref_idx.numpy().reshape(-1)))


def test_vq_decode_force_not_quantize():
    ref, ours, params = _tiny_pair()
    h = np.random.RandomState(2).randn(1, 4, 4, 4).astype(np.float32)
    with torch.no_grad():
        ref_dec = ref.decode(torch.from_numpy(h), force_not_quantize=True).sample.numpy()
    dec = np.asarray(ours.decode(params, jnp.asarray(h), force_not_quantize=True).sample)
    assert np.max(np.abs(dec - ref_dec)) < 5e-5
