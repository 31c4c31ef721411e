"""SD3Transformer2DModel parity vs torch reference (tiny SD3.0 and SD3.5-style)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_sd3 import SD3Transformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    sample_size=32,
    patch_size=1,
    in_channels=4,
    num_layers=2,
    attention_head_dim=8,
    num_attention_heads=4,
    joint_attention_dim=32,
    caption_projection_dim=32,
    pooled_projection_dim=64,
    out_channels=4,
    pos_embed_max_size=96,
)


@pytest.mark.parametrize("extra", [{}, {"dual_attention_layers": (0,), "qk_norm": "rms_norm"}])
def test_sd3_parity(extra):
    torch = pytest.importorskip("torch")
    from diffusers import SD3Transformer2DModel as TorchSD3

    cfg = {**TINY, **extra}
    tm = TorchSD3(**cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items() if not k.endswith("pos_embed.pos_embed")}
    m = SD3Transformer2DModel(**cfg)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 32, 32).astype(np.float32)
    ehs = rng.randn(2, 8, 32).astype(np.float32)
    pooled = rng.randn(2, 64).astype(np.float32)
    t = np.array([2.0, 2.0], dtype=np.float32)
    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x),
            encoder_hidden_states=torch.from_numpy(ehs),
            pooled_projections=torch.from_numpy(pooled),
            timestep=torch.from_numpy(t),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(pooled), jnp.asarray(t)).sample
    )
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))
