"""JoyImage Edit Plus: padded-patch-sequence transformer parity vs torch
reference (variable-resolution multi-image editing).

Reference: `/root/reference/src/diffusers/models/transformers/transformer_joyimage_edit_plus.py:317`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_joyimage_edit_plus import (
    JoyImageEditPlusTransformer3DModel,
)

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=[1, 2, 2],
    in_channels=4,
    hidden_size=24,
    num_attention_heads=2,
    text_dim=16,
    mlp_width_ratio=2.0,
    num_layers=2,
    rope_dim_list=[4, 4, 4],
    theta=256,
)

# two samples: (target 1x4x4 + ref 1x2x2) and (target 1x2x4) — variable res
SHAPE_LIST = [[(1, 4, 4), (1, 2, 2)], [(1, 2, 4)]]
MAX_PATCHES = 24  # >= 16+4 and >= 8, with padding


def _inputs():
    rng = np.random.RandomState(0)
    x = rng.randn(2, MAX_PATCHES, 4, 1, 2, 2).astype(np.float32)
    ehs = rng.randn(2, 5, 16).astype(np.float32)
    mask = np.ones((2, 5), dtype=np.int64)
    mask[1, 3:] = 0
    t = np.array([500.0, 20.0], dtype=np.float32)
    return x, ehs, mask, t


@pytest.mark.refparity
def test_edit_plus_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers.models.transformers.transformer_joyimage_edit_plus import (
        JoyImageEditPlusTransformer3DModel as TorchModel,
    )

    tm = TorchModel(**TINY)
    tm.eval()
    with torch.no_grad():  # zero modulation tables degenerate; randomize
        for n, p in tm.named_parameters():
            if (p == 0).all():
                p.data.normal_(0.0, 0.05)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = JoyImageEditPlusTransformer3DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    x, ehs, mask, t = _inputs()
    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ehs),
            encoder_hidden_states_mask=torch.from_numpy(mask),
            shape_list=SHAPE_LIST,
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs),
          encoder_hidden_states_mask=jnp.asarray(mask), shape_list=SHAPE_LIST).sample
    )
    assert out.shape == ref.shape
    # padded patch rows attend to nothing real; compare only the real rows
    for i, comps in enumerate(SHAPE_LIST):
        n = sum(a * b * c for a, b, c in comps)
        d = np.max(np.abs(out[i, :n] - ref[i, :n]))
        assert d < 2e-3, d


def test_edit_plus_smoke_shapes():
    key = jax.random.PRNGKey(0)
    m = JoyImageEditPlusTransformer3DModel(**TINY)
    params = m.init_params(key)
    x, ehs, mask, t = _inputs()
    out = m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs),
            encoder_hidden_states_mask=jnp.asarray(mask), shape_list=SHAPE_LIST).sample
    assert out.shape == (2, MAX_PATCHES, 4, 1, 2, 2)
    assert np.isfinite(np.asarray(out)).all()
