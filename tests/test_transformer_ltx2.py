"""LTX2VideoTransformer3DModel (audiovisual) parity vs torch reference (tiny config)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_ltx2 import LTX2VideoTransformer3DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    in_channels=8,
    out_channels=8,
    num_attention_heads=2,
    attention_head_dim=12,
    cross_attention_dim=24,  # == inner_dim (captions are projected to inner_dim)
    audio_in_channels=6,
    audio_out_channels=6,
    audio_num_attention_heads=2,
    audio_attention_head_dim=8,
    audio_cross_attention_dim=16,  # == audio_inner_dim (also the a2v/v2a rope dim)
    num_layers=2,
    caption_channels=16,
)


def _inputs(rng, batch=1):
    f, h, w = 2, 4, 4
    s_a = 6
    x = rng.randn(batch, f * h * w, 8).astype(np.float32)
    xa = rng.randn(batch, s_a, 6).astype(np.float32)
    t = np.full((batch,), 500.0, dtype=np.float32)
    ehs = rng.randn(batch, 12, 16).astype(np.float32)
    a_ehs = rng.randn(batch, 12, 16).astype(np.float32)
    mask = np.ones((batch, 12), dtype=np.int64)
    mask[:, 9:] = 0
    return x, xa, t, ehs, a_ehs, mask, (f, h, w, s_a)


def _run_pair(cfg, fwd_kwargs_torch, fwd_kwargs_jax, atol=5e-4):
    torch = pytest.importorskip("torch")
    from diffusers import LTX2VideoTransformer3DModel as TorchLTX2

    tm = TorchLTX2(**cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = LTX2VideoTransformer3DModel(**cfg)
    params = convert_torch_state_dict(m, sd)
    with torch.no_grad():
        ref = tm(**fwd_kwargs_torch)
        ref_v, ref_a = ref.sample.numpy(), ref.audio_sample.numpy()
    out = m(params, **fwd_kwargs_jax)
    out_v, out_a = np.asarray(out.sample), np.asarray(out.audio_sample)
    assert out_v.shape == ref_v.shape and out_a.shape == ref_a.shape
    assert np.max(np.abs(out_v - ref_v)) < atol, np.max(np.abs(out_v - ref_v))
    assert np.max(np.abs(out_a - ref_a)) < atol, np.max(np.abs(out_a - ref_a))
    return m, params


def test_ltx2_parity_basic():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x, xa, t, ehs, a_ehs, mask, (f, h, w, s_a) = _inputs(rng)
    common = dict(num_frames=f, height=h, width=w, audio_num_frames=s_a, fps=24.0)
    _run_pair(
        TINY,
        dict(
            hidden_states=torch.from_numpy(x),
            audio_hidden_states=torch.from_numpy(xa),
            encoder_hidden_states=torch.from_numpy(ehs),
            audio_encoder_hidden_states=torch.from_numpy(a_ehs),
            timestep=torch.from_numpy(t),
            encoder_attention_mask=torch.from_numpy(mask),
            **common,
        ),
        dict(
            hidden_states=jnp.asarray(x),
            audio_hidden_states=jnp.asarray(xa),
            encoder_hidden_states=jnp.asarray(ehs),
            audio_encoder_hidden_states=jnp.asarray(a_ehs),
            timestep=jnp.asarray(t),
            encoder_attention_mask=jnp.asarray(mask),
            **common,
        ),
    )


def test_ltx2_parity_gated_adaln_stg():
    """LTX-2.3-style features: gated attention, cross-attn adaLN (sigma),
    split rope, and STG perturbation on block 1."""
    torch = pytest.importorskip("torch")
    cfg = dict(
        TINY,
        gated_attn=True,
        audio_gated_attn=True,
        cross_attn_mod=True,
        audio_cross_attn_mod=True,
        rope_type="split",
        perturbed_attn=True,
        use_cross_timestep=False,
    )
    cfg.pop("use_cross_timestep")
    rng = np.random.RandomState(1)
    batch = 2
    x, xa, t, ehs, a_ehs, mask, (f, h, w, s_a) = _inputs(rng, batch=batch)
    sigma = np.full((batch,), 0.5, dtype=np.float32)
    pmask = np.array([1.0, 0.0], dtype=np.float32)  # STG perturbs sample 1
    common = dict(
        num_frames=f, height=h, width=w, audio_num_frames=s_a, fps=24.0,
        spatio_temporal_guidance_blocks=[1], use_cross_timestep=True,
    )
    _run_pair(
        cfg,
        dict(
            hidden_states=torch.from_numpy(x),
            audio_hidden_states=torch.from_numpy(xa),
            encoder_hidden_states=torch.from_numpy(ehs),
            audio_encoder_hidden_states=torch.from_numpy(a_ehs),
            timestep=torch.from_numpy(t),
            sigma=torch.from_numpy(sigma),
            encoder_attention_mask=torch.from_numpy(mask),
            perturbation_mask=torch.from_numpy(pmask),
            **common,
        ),
        dict(
            hidden_states=jnp.asarray(x),
            audio_hidden_states=jnp.asarray(xa),
            encoder_hidden_states=jnp.asarray(ehs),
            audio_encoder_hidden_states=jnp.asarray(a_ehs),
            timestep=jnp.asarray(t),
            sigma=jnp.asarray(sigma),
            encoder_attention_mask=jnp.asarray(mask),
            perturbation_mask=jnp.asarray(pmask),
            **common,
        ),
    )


def test_ltx2_scan_blocks_matches_loop():
    m = LTX2VideoTransformer3DModel(**TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    x, xa, t, ehs, a_ehs, mask, (f, h, w, s_a) = _inputs(rng)
    kwargs = dict(
        encoder_attention_mask=jnp.asarray(mask),
        num_frames=f, height=h, width=w, audio_num_frames=s_a,
    )
    args = (jnp.asarray(x), jnp.asarray(xa), jnp.asarray(ehs), jnp.asarray(a_ehs), jnp.asarray(t))
    a = m(params, *args, **kwargs)
    b = m(params, *args, scan_blocks=True, **kwargs)
    np.testing.assert_allclose(np.asarray(a.sample), np.asarray(b.sample), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.audio_sample), np.asarray(b.audio_sample), atol=1e-5)
