"""Gemma2Model (native Sana text encoder) parity vs transformers."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.text_encoders.gemma import Gemma2Model

TINY = dict(vocab_size=256, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8)


def test_gemma2_parity_vs_transformers():
    torch = pytest.importorskip("torch")
    from transformers import Gemma2Config, Gemma2Model as TorchGemma2

    cfg = Gemma2Config(**TINY, max_position_embeddings=64, attn_implementation="eager")
    tm = TorchGemma2(cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    m = Gemma2Model(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    ids = rng.randint(2, 250, (2, 12))
    mask = np.ones((2, 12), dtype=np.int64)
    mask[1, 9:] = 0
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    out = np.asarray(m(params, jnp.asarray(ids), attention_mask=jnp.asarray(mask)).last_hidden_state)
    assert out.shape == ref.shape
    # compare only unmasked positions (masked positions are junk on both sides)
    err = np.abs(out - ref) * mask[..., None]
    assert err.max() < 5e-4, err.max()


TINY3 = dict(vocab_size=256, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
             num_attention_heads=4, num_key_value_heads=2, head_dim=8,
             rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
             query_pre_attn_scalar=8, sliding_window=8, sliding_window_pattern=2,
             rope_scaling={"rope_type": "linear", "factor": 8.0})


def test_gemma3_parity_vs_transformers():
    torch = pytest.importorskip("torch")
    from transformers import Gemma3TextConfig, Gemma3TextModel as TorchGemma3

    from diffusers_tpu.models.text_encoders.gemma import Gemma3TextModel

    cfg = Gemma3TextConfig(**TINY3, max_position_embeddings=64, attn_implementation="eager")
    tm = TorchGemma3(cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    m = Gemma3TextModel(**TINY3)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    ids = rng.randint(2, 250, (2, 16))  # > sliding_window to exercise local masking
    mask = np.ones((2, 16), dtype=np.int64)
    mask[1, 12:] = 0
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask),
                 output_hidden_states=True)
    got = m(params, jnp.asarray(ids), attention_mask=jnp.asarray(mask), output_hidden_states=True)
    assert len(got.hidden_states) == len(ref.hidden_states)
    err = np.abs(np.asarray(got.last_hidden_state) - ref.last_hidden_state.numpy()) * mask[..., None]
    assert err.max() < 5e-4, err.max()
    for i, (a, b) in enumerate(zip(got.hidden_states, ref.hidden_states)):
        err = np.abs(np.asarray(a) - b.numpy()) * mask[..., None]
        assert err.max() < 5e-4, (i, err.max())
