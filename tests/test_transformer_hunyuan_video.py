"""HunyuanVideoTransformer3DModel parity vs torch reference (tiny config)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_hunyuan_video import HunyuanVideoTransformer3DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    in_channels=4,
    out_channels=4,
    num_attention_heads=2,
    attention_head_dim=10,
    num_layers=2,
    num_single_layers=2,
    num_refiner_layers=1,
    patch_size=1,
    patch_size_t=1,
    guidance_embeds=True,
    text_embed_dim=16,
    pooled_projection_dim=8,
    rope_axes_dim=(2, 4, 4),
)


def _inputs():
    rng = np.random.RandomState(0)
    batch = 1
    return dict(
        hidden_states=rng.randn(batch, 4, 1, 4, 4).astype(np.float32),
        timestep=np.array([900], dtype=np.int64),
        encoder_hidden_states=rng.randn(batch, 6, 16).astype(np.float32),
        encoder_attention_mask=np.array([[1, 1, 1, 1, 0, 0]], dtype=np.int64),
        pooled_projections=rng.randn(batch, 8).astype(np.float32),
        guidance=np.array([6.0 * 1000], dtype=np.float32),
    )


@pytest.mark.refparity
@pytest.mark.parametrize("image_condition_type", [None, "token_replace"])
def test_hunyuan_video_parity(image_condition_type):
    torch = pytest.importorskip("torch")
    from diffusers import HunyuanVideoTransformer3DModel as TorchHV

    cfg = dict(TINY, image_condition_type=image_condition_type)
    if image_condition_type == "token_replace":
        cfg["guidance_embeds"] = False
    tm = TorchHV(**{**cfg, "rope_axes_dim": list(cfg["rope_axes_dim"])})
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = HunyuanVideoTransformer3DModel(**cfg)
    params = convert_torch_state_dict(m, sd)

    ins = _inputs()
    if not cfg["guidance_embeds"]:
        ins.pop("guidance")
    with torch.no_grad():
        ref = tm(**{k: torch.from_numpy(v) for k, v in ins.items()}).sample.numpy()
    out = np.asarray(m(params, **{k: jnp.asarray(v) for k, v in ins.items()}).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))
