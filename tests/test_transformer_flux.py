"""FluxTransformer2DModel parity vs torch reference (tiny config, mirrors
`tests/models/transformers/test_models_transformer_flux.py`)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_flux import FluxTransformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=1,
    in_channels=4,
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=16,
    num_attention_heads=2,
    joint_attention_dim=32,
    pooled_projection_dim=32,
    axes_dims_rope=(4, 6, 6),
)


def _inputs(guidance=False):
    rng = np.random.RandomState(0)
    batch, img_seq, txt_seq = 2, 16, 8
    return dict(
        hidden_states=rng.randn(batch, img_seq, 4).astype(np.float32),
        encoder_hidden_states=rng.randn(batch, txt_seq, 32).astype(np.float32),
        pooled_projections=rng.randn(batch, 32).astype(np.float32),
        timestep=np.array([0.7, 0.7], dtype=np.float32),
        img_ids=rng.randint(0, 8, (img_seq, 3)).astype(np.float32),
        txt_ids=np.zeros((txt_seq, 3), dtype=np.float32),
        guidance=np.array([3.5, 3.5], dtype=np.float32) if guidance else None,
    )


@pytest.mark.parametrize("guidance_embeds", [False, True])
def test_flux_parity(guidance_embeds):
    torch = pytest.importorskip("torch")
    from diffusers import FluxTransformer2DModel as TorchFlux

    tm = TorchFlux(**TINY, guidance_embeds=guidance_embeds)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = FluxTransformer2DModel(**TINY, guidance_embeds=guidance_embeds)
    params = convert_torch_state_dict(m, sd)

    ins = _inputs(guidance=guidance_embeds)
    with torch.no_grad():
        torch_ins = {k: torch.from_numpy(v) for k, v in ins.items() if v is not None}
        ref = tm(**torch_ins).sample.numpy()
    jax_ins = {k: jnp.asarray(v) for k, v in ins.items() if v is not None}
    out = np.asarray(m(params, **jax_ins).sample)
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_flux_precomputed_rope_matches_traced():
    m = FluxTransformer2DModel(**TINY)
    params = m.init_params(jax.random.PRNGKey(0))
    ins = _inputs()
    jax_ins = {k: jnp.asarray(v) for k, v in ins.items() if v is not None}
    out1 = m(params, **jax_ins).sample

    ids = np.concatenate([ins["txt_ids"], ins["img_ids"]], axis=0)
    cos, sin = m.pos_embed({}, ids)  # numpy float64 host path
    jax_ins2 = {k: v for k, v in jax_ins.items() if k not in ("img_ids", "txt_ids")}
    out2 = m(params, **jax_ins2, image_rotary_emb=(jnp.asarray(cos), jnp.asarray(sin))).sample
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)
