"""CogVideoXTransformer3DModel parity vs torch reference (tiny config)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.cogvideox_transformer_3d import CogVideoXTransformer3DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    num_attention_heads=2,
    attention_head_dim=16,
    in_channels=4,
    out_channels=4,
    time_embed_dim=16,
    text_embed_dim=16,
    num_layers=2,
    sample_width=8,
    sample_height=8,
    sample_frames=5,  # pre-compression frames: (5-1)/4+1 = 2 latent frames
    patch_size=2,
    temporal_compression_ratio=4,
    max_text_seq_length=12,
)


def _inputs(rng):
    x = rng.randn(1, 2, 4, 8, 8).astype(np.float32)  # [B, F, C, H, W]
    t = np.array([500], dtype=np.int64)
    ehs = rng.randn(1, 12, 16).astype(np.float32)
    return x, t, ehs


def test_cogvideox_parity_sincos():
    torch = pytest.importorskip("torch")
    from diffusers import CogVideoXTransformer3DModel as TorchCog

    tm = TorchCog(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = CogVideoXTransformer3DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    x, t, ehs = _inputs(np.random.RandomState(0))
    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x),
            encoder_hidden_states=torch.from_numpy(ehs),
            timestep=torch.from_numpy(t),
        ).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t)).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_cogvideox_parity_rope():
    torch = pytest.importorskip("torch")
    from diffusers import CogVideoXTransformer3DModel as TorchCog
    from diffusers.models.embeddings import get_3d_rotary_pos_embed

    cfg = dict(TINY, use_rotary_positional_embeddings=True)
    tm = TorchCog(**cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = CogVideoXTransformer3DModel(**cfg)
    params = convert_torch_state_dict(m, sd)

    x, t, ehs = _inputs(np.random.RandomState(1))

    cos, sin = m.rope(height=8, width=8, num_frames=2)
    # cross-check the table itself against the reference helper
    grid_h = grid_w = 8 // 2
    ref_cos, ref_sin = get_3d_rotary_pos_embed(
        TINY["attention_head_dim"], ((0, 0), (grid_h, grid_w)), (grid_h, grid_w), 2,
        use_real=True, device="cpu",
    )
    np.testing.assert_allclose(np.asarray(cos), ref_cos.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), ref_sin.numpy(), atol=1e-5)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x),
            encoder_hidden_states=torch.from_numpy(ehs),
            timestep=torch.from_numpy(t),
            image_rotary_emb=(ref_cos, ref_sin),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t), image_rotary_emb=(cos, sin)).sample
    )
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_cogvideox_jit_smoke():
    m = CogVideoXTransformer3DModel(**TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    x, t, ehs = _inputs(np.random.RandomState(2))

    @jax.jit
    def fwd(p, x, ehs, t):
        return m(p, x, ehs, t).sample

    out = fwd(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
