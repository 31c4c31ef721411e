"""Sana ControlNet parity vs torch reference + transformer integration.

Reference: models/controlnets/controlnet_sana.py:41,
sana_transformer.py:517 (residual placement after blocks 1..N).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.controlnets.controlnet_sana import SanaControlNetModel
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.sana_transformer import SanaTransformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=8,
    num_layers=2, num_cross_attention_heads=2, cross_attention_head_dim=8,
    cross_attention_dim=16, caption_channels=12, mlp_ratio=2.0,
    sample_size=8, patch_size=1,
)


def _inputs(rng):
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    cond = rng.randn(2, 4, 8, 8).astype(np.float32)
    ehs = rng.randn(2, 6, 12).astype(np.float32)
    t = np.array([3.0, 7.0], dtype=np.float32)
    return x, cond, ehs, t


def test_sana_controlnet_parity():
    torch = pytest.importorskip("torch")
    from diffusers.models.controlnets.controlnet_sana import SanaControlNetModel as TorchCN

    torch.manual_seed(0)
    tm = TorchCN(**TINY)
    tm.eval()
    with torch.no_grad():  # randomize the zero-init paths so parity is non-trivial
        tm.input_block.weight.normal_()
        tm.input_block.bias.normal_()
        for blk in tm.controlnet_blocks:
            blk.weight.normal_()
            blk.bias.normal_()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = SanaControlNetModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    x, cond, ehs, t = _inputs(np.random.RandomState(0))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(ehs), torch.from_numpy(t),
                 controlnet_cond=torch.from_numpy(cond), conditioning_scale=0.7).controlnet_block_samples
    ours = m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t),
             controlnet_cond=jnp.asarray(cond), conditioning_scale=0.7).controlnet_block_samples
    assert len(ours) == len(ref) == 2
    for o, r in zip(ours, ref):
        err = np.max(np.abs(np.asarray(o) - r.numpy()))
        assert err < 5e-4, f"sana controlnet diverges: {err}"


def test_sana_transformer_consumes_residuals_like_reference():
    torch = pytest.importorskip("torch")
    from diffusers import SanaTransformer2DModel as TorchSana

    torch.manual_seed(0)
    tm = TorchSana(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = SanaTransformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    ehs = rng.randn(2, 6, 12).astype(np.float32)
    t = np.array([3.0, 7.0], dtype=np.float32)
    inner = TINY["num_attention_heads"] * TINY["attention_head_dim"]
    residuals = [rng.randn(2, 64, inner).astype(np.float32)]

    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(ehs), torch.from_numpy(t),
                 controlnet_block_samples=[torch.from_numpy(r) for r in residuals]).sample.numpy()
    ours = np.asarray(m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t),
                        controlnet_block_samples=[jnp.asarray(r) for r in residuals]).sample)
    err = np.max(np.abs(ours - ref))
    assert err < 5e-4, f"residual consumption diverges: {err}"


def test_sana_controlnet_zero_init_is_noop():
    m = SanaControlNetModel(**TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    x, cond, ehs, t = _inputs(np.random.RandomState(2))
    out = m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t),
            controlnet_cond=jnp.asarray(cond)).controlnet_block_samples
    for s in out:
        np.testing.assert_allclose(np.asarray(s), 0.0)
