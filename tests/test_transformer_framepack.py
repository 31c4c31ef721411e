"""HunyuanVideo Framepack transformer: parity vs the torch reference with
1x/2x/4x history streams, CLIP-vision projection, and explicit frame indices.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_hunyuan_video_framepack.py:115`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_hunyuan_video_framepack import (
    HunyuanVideoFramepackTransformer3DModel,
)

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    in_channels=4,
    out_channels=4,
    num_attention_heads=2,
    attention_head_dim=10,
    num_layers=1,
    num_single_layers=1,
    num_refiner_layers=1,
    patch_size=2,
    patch_size_t=1,
    guidance_embeds=True,
    text_embed_dim=16,
    pooled_projection_dim=8,
    rope_axes_dim=(2, 4, 4),
    has_image_proj=True,
    image_proj_dim=12,
    has_clean_x_embedder=True,
)


@pytest.mark.refparity
def test_framepack_transformer_parity():
    # the reference forward requires the history streams whenever
    # has_clean_x_embedder is set (its real checkpoints always pass them)
    with_history = True
    torch = pytest.importorskip("torch")
    from diffusers import HunyuanVideoFramepackTransformer3DModel as TorchModel

    torch.manual_seed(0)
    tm = TorchModel(**TINY).eval()
    m = HunyuanVideoFramepackTransformer3DModel(**TINY)
    params = convert_torch_state_dict(m, {k: v.detach().numpy() for k, v in tm.state_dict().items()})

    rng = np.random.RandomState(0)
    b, f, h, w = 2, 2, 8, 8
    ins = dict(
        hidden_states=rng.randn(b, 4, f, h, w).astype(np.float32),
        timestep=np.array([500, 500], dtype=np.int64),
        encoder_hidden_states=rng.randn(b, 6, 16).astype(np.float32),
        encoder_attention_mask=np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 0, 0, 0]], np.int64),
        pooled_projections=rng.randn(b, 8).astype(np.float32),
        image_embeds=rng.randn(b, 3, 12).astype(np.float32),
        guidance=np.array([6000.0, 6000.0], dtype=np.float32),
    )
    indices = dict(indices_latents=np.arange(1, 1 + f))
    if with_history:
        ins.update(
            latents_clean=rng.randn(b, 4, 2, h, w).astype(np.float32),
            latents_history_2x=rng.randn(b, 4, 2, h, w).astype(np.float32),
            latents_history_4x=rng.randn(b, 4, 4, h, w).astype(np.float32),
        )
        indices.update(
            indices_latents_clean=np.array([0, 3]),
            indices_latents_history_2x=np.array([4, 5]),
            indices_latents_history_4x=np.array([6, 7, 8, 9]),
        )

    with torch.no_grad():
        t_ins = {k: torch.from_numpy(v) for k, v in ins.items()}
        t_idx = {k: torch.from_numpy(np.asarray(v)) for k, v in indices.items()}
        ref = tm(**t_ins, **t_idx).sample.numpy()

    out = np.asarray(
        m(params, **{k: jnp.asarray(v) for k, v in ins.items()}, **indices).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))
