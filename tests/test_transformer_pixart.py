"""PixArtTransformer2DModel parity vs torch reference (tiny config)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.pixart_transformer_2d import PixArtTransformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    num_attention_heads=2,
    attention_head_dim=8,
    in_channels=4,
    out_channels=8,
    num_layers=2,
    cross_attention_dim=16,
    sample_size=16,
    patch_size=2,
    caption_channels=12,
)


def test_pixart_parity():
    torch = pytest.importorskip("torch")
    from diffusers import PixArtTransformer2DModel as TorchPixArt

    tm = TorchPixArt(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items() if not k.endswith("pos_embed.pos_embed")}
    m = PixArtTransformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    ehs = rng.randn(2, 8, 12).astype(np.float32)
    t = np.array([500, 500], dtype=np.int64)
    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x),
            encoder_hidden_states=torch.from_numpy(ehs),
            timestep=torch.from_numpy(t),
        ).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t)).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))
