"""T5 encoder parity vs transformers (tiny config)."""

import numpy as np
import jax.numpy as jnp
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel

TINY = dict(
    vocab_size=512,
    d_model=32,
    d_kv=8,
    d_ff=64,
    num_layers=3,
    num_heads=4,
    feed_forward_proj="gated-gelu",
)


def test_t5_parity():
    torch = pytest.importorskip("torch")
    from transformers import T5Config, T5EncoderModel as TorchT5

    cfg = T5Config(**TINY)
    tm = TorchT5(cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = T5EncoderModel(**TINY)
    sd.pop("encoder.embed_tokens.weight", None)
    params = convert_torch_state_dict(m, sd)

    ids = np.array([[5, 9, 100, 4, 1, 0, 0], [3, 2, 1, 0, 0, 0, 0]])
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    out = np.asarray(m(params, jnp.asarray(ids), attention_mask=jnp.asarray(mask)).last_hidden_state)
    # compare only unmasked positions (masked positions differ arbitrarily)
    m_ = mask.astype(bool)
    assert np.max(np.abs(out[m_] - ref[m_])) < 5e-5, np.max(np.abs(out[m_] - ref[m_]))


def test_t5_no_mask_parity():
    torch = pytest.importorskip("torch")
    from transformers import T5Config, T5EncoderModel as TorchT5

    cfg = T5Config(**TINY)
    tm = TorchT5(cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    sd.pop("encoder.embed_tokens.weight", None)
    m = T5EncoderModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    ids = np.array([[5, 9, 100, 4, 1, 17, 3]])
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids)).last_hidden_state.numpy()
    out = np.asarray(m(params, jnp.asarray(ids)).last_hidden_state)
    assert np.max(np.abs(out - ref)) < 5e-5, np.max(np.abs(out - ref))
