"""LlamaModel (text encoder) parity vs transformers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.text_encoders.llama import LlamaModel


@pytest.mark.refparity
def test_llama_parity():
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaModel as HFLlama

    cfg = LlamaConfig(
        vocab_size=500, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, rms_norm_eps=1e-5, rope_theta=500000.0,
    )
    hf = HFLlama(cfg)
    hf.eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items() if "rotary_emb" not in k}
    m = LlamaModel(vocab_size=500, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                   num_attention_heads=4, num_key_value_heads=2)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 500, (2, 11))
    mask = np.ones((2, 11), dtype=np.int64)
    mask[1, 7:] = 0
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask),
                 output_hidden_states=True)
    out = m(params, jnp.asarray(ids), attention_mask=jnp.asarray(mask), output_hidden_states=True)

    assert len(out.hidden_states) == len(ref.hidden_states)
    # compare only valid positions (masked ones diverge harmlessly)
    valid = mask.astype(bool)
    for mine, theirs in zip(out.hidden_states, ref.hidden_states):
        diff = np.abs(np.asarray(mine) - theirs.numpy())[valid]
        assert diff.max() < 5e-4, diff.max()
