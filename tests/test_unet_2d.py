"""UNet2DModel tests: shape, determinism, torch-checkpoint parity.

Parity test mirrors the reference's tiny-model strategy
(`tests/models/unets/test_models_unet_2d.py`): build the same tiny config in
the reference torch implementation, copy weights across, and compare outputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusers_tpu.models import UNet2DModel
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict, flatten_to_torch_state_dict

TINY_CONFIG = dict(
    sample_size=32,
    in_channels=3,
    out_channels=3,
    block_out_channels=(32, 64),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    layers_per_block=2,
    attention_head_dim=8,
    norm_num_groups=32,
)


def test_init_and_forward_shape():
    model = UNet2DModel(**TINY_CONFIG)
    params = model.init_params(jax.random.PRNGKey(0))
    sample = jnp.zeros((2, 3, 32, 32))
    out = model(params, sample, 10).sample
    assert out.shape == (2, 3, 32, 32)


def test_forward_deterministic():
    model = UNet2DModel(**TINY_CONFIG)
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 32, 32))
    a = model(params, x, 5).sample
    b = model(params, x, 5).sample
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_parity_with_torch_reference():
    """Same weights, same input → same output as the reference torch model."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/reference/src")
    from diffusers import UNet2DModel as TorchUNet2DModel

    torch_model = TorchUNet2DModel(**TINY_CONFIG)
    torch_model.eval()
    state_dict = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}

    model = UNet2DModel(**TINY_CONFIG)
    params = convert_torch_state_dict(model, state_dict)

    x = np.random.RandomState(0).randn(1, 3, 32, 32).astype(np.float32)
    t = 7
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x), t).sample.numpy()
    out = np.asarray(model(params, jnp.asarray(x), t).sample)

    assert np.max(np.abs(out - ref)) < 2e-4, f"max abs diff {np.max(np.abs(out - ref))}"


def test_state_dict_roundtrip():
    model = UNet2DModel(**TINY_CONFIG)
    params = model.init_params(jax.random.PRNGKey(0))
    sd = flatten_to_torch_state_dict(model, params)
    params2 = convert_torch_state_dict(model, sd)

    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config_save_load(tmp_path):
    model = UNet2DModel(**TINY_CONFIG)
    params = model.init_params(jax.random.PRNGKey(0))
    model.save_pretrained(tmp_path, params)
    model2, params2 = UNet2DModel.from_pretrained(tmp_path)
    assert model2.config.block_out_channels == list(TINY_CONFIG["block_out_channels"]) or tuple(
        model2.config.block_out_channels
    ) == TINY_CONFIG["block_out_channels"]
    x = jnp.ones((1, 3, 32, 32))
    a = model(params, x, 3).sample
    b = model2(params2, x, 3).sample
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
