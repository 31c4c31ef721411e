"""CLIP text encoder parity vs transformers (tiny config)."""

import numpy as np
import jax.numpy as jnp
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.text_encoders.clip import CLIPTextModel, CLIPTextModelWithProjection

TINY = dict(
    vocab_size=1000,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    max_position_embeddings=77,
    hidden_act="quick_gelu",
    projection_dim=32,
    eos_token_id=2,
)


def _torch_model(with_projection):
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig, CLIPTextModel as TorchCLIP, CLIPTextModelWithProjection as TorchCLIPProj

    cfg = CLIPTextConfig(**TINY)
    tm = (TorchCLIPProj if with_projection else TorchCLIP)(cfg)
    tm.eval()
    return torch, tm


def test_clip_parity():
    torch, tm = _torch_model(False)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items() if not k.endswith("position_ids")}
    m = CLIPTextModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    ids = np.array([[49406, 5, 6, 7, 999, 2, 0, 0], [49406, 10, 2, 0, 0, 0, 0, 0]]) % TINY["vocab_size"]
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids), output_hidden_states=True)
    out = m(params, jnp.asarray(ids), output_hidden_states=True)

    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state), ref.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(out.pooler_output), ref.pooler_output.numpy(), atol=2e-5, rtol=1e-4)
    # penultimate hidden state (SDXL path)
    np.testing.assert_allclose(
        np.asarray(out.hidden_states[-2]), ref.hidden_states[-2].numpy(), atol=2e-5, rtol=1e-4
    )


def test_clip_with_projection_parity():
    torch, tm = _torch_model(True)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items() if not k.endswith("position_ids")}
    m = CLIPTextModelWithProjection(**TINY)
    params = convert_torch_state_dict(m, sd)

    ids = np.array([[49406, 5, 6, 2, 0]]) % TINY["vocab_size"]
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids))
    out = m(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out.text_embeds), ref.text_embeds.numpy(), atol=2e-5, rtol=1e-4)
