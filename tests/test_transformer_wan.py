"""WanTransformer3DModel parity vs torch reference (tiny config)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_wan import WanTransformer3DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=(1, 2, 2),
    num_attention_heads=2,
    attention_head_dim=12,
    in_channels=4,
    out_channels=4,
    text_dim=16,
    freq_dim=16,
    ffn_dim=32,
    num_layers=2,
    cross_attn_norm=True,
    qk_norm="rms_norm_across_heads",
    rope_max_seq_len=32,
)


def test_wan_parity():
    torch = pytest.importorskip("torch")
    from diffusers import WanTransformer3DModel as TorchWan

    tm = TorchWan(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = WanTransformer3DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 2, 8, 8).astype(np.float32)
    t = np.array([500], dtype=np.int64)
    ehs = rng.randn(1, 12, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x),
            timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ehs),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))
