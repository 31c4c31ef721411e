"""SkyReels-V2 transformer parity vs the torch reference (standard, causal
mask, fps injection, diffusion forcing)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_skyreels_v2 import SkyReelsV2Transformer3DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=(1, 2, 2),
    num_attention_heads=2,
    attention_head_dim=12,
    in_channels=4,
    out_channels=4,
    text_dim=16,
    freq_dim=32,
    ffn_dim=32,
    num_layers=2,
    cross_attn_norm=True,
    inject_sample_info=False,
    num_frame_per_block=1,
)


def _models(**overrides):
    torch = pytest.importorskip("torch")
    from diffusers import SkyReelsV2Transformer3DModel as TorchModel

    cfg = {**TINY, **overrides}
    tm = TorchModel(**cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = SkyReelsV2Transformer3DModel(**cfg)
    params = convert_torch_state_dict(m, sd)
    return torch, tm, m, params


def test_skyreels_standard_parity():
    torch, tm, m, params = _models()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 4, 8, 8).astype(np.float32)
    ehs = rng.randn(2, 6, 16).astype(np.float32)
    t = np.array([500, 100], dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ehs)).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs)).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_skyreels_causal_fps_parity():
    torch, tm, m, params = _models(num_frame_per_block=2, inject_sample_info=True)
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 4, 8, 8).astype(np.float32)
    ehs = rng.randn(1, 6, 16).astype(np.float32)
    t = np.array([300], dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ehs), fps=torch.tensor([1])).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs), fps=jnp.asarray([1])).sample)
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_skyreels_diffusion_forcing_parity():
    torch, tm, m, params = _models()
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 4, 8, 8).astype(np.float32)
    ehs = rng.randn(1, 6, 16).astype(np.float32)
    t = np.array([[100, 200, 300, 400]], dtype=np.float32)  # per latent frame
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ehs),
            enable_diffusion_forcing=True,
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs), enable_diffusion_forcing=True).sample
    )
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))
