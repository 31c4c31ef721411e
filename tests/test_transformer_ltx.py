"""LTXVideoTransformer3DModel parity vs torch reference (tiny config)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_ltx import LTXVideoTransformer3DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    in_channels=8,
    out_channels=8,
    patch_size=1,
    patch_size_t=1,
    num_attention_heads=2,
    attention_head_dim=12,
    cross_attention_dim=24,  # == inner_dim: the model projects captions to inner_dim first
    num_layers=2,
    caption_channels=16,
)


def _inputs(rng):
    batch, f, h, w = 1, 2, 4, 4
    x = rng.randn(batch, f * h * w, 8).astype(np.float32)
    t = np.array([500], dtype=np.int64)
    ehs = rng.randn(batch, 12, 16).astype(np.float32)
    mask = np.ones((batch, 12), dtype=np.int64)
    mask[:, 9:] = 0
    return x, t, ehs, mask, (f, h, w)


def test_ltx_parity():
    torch = pytest.importorskip("torch")
    from diffusers import LTXVideoTransformer3DModel as TorchLTX

    tm = TorchLTX(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = LTXVideoTransformer3DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x, t, ehs, mask, (f, h, w) = _inputs(rng)
    scale = (1.0, 32.0, 32.0)
    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x),
            encoder_hidden_states=torch.from_numpy(ehs),
            timestep=torch.from_numpy(t),
            encoder_attention_mask=torch.from_numpy(mask),
            num_frames=f,
            height=h,
            width=w,
            rope_interpolation_scale=scale,
        ).sample.numpy()
    out = np.asarray(
        m(
            params,
            jnp.asarray(x),
            jnp.asarray(ehs),
            jnp.asarray(t),
            encoder_attention_mask=jnp.asarray(mask),
            num_frames=f,
            height=h,
            width=w,
            rope_interpolation_scale=scale,
        ).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_ltx_scan_blocks_matches_loop():
    m = LTXVideoTransformer3DModel(**TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    x, t, ehs, mask, (f, h, w) = _inputs(rng)
    kwargs = dict(
        encoder_attention_mask=jnp.asarray(mask), num_frames=f, height=h, width=w,
        rope_interpolation_scale=(1.0, 32.0, 32.0),
    )
    a = m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t), **kwargs).sample
    b = m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t), scan_blocks=True, **kwargs).sample
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
