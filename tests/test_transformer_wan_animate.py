"""Wan-Animate transformer parity vs the torch reference (motion encoder with
QR decomposition, causal face encoder, pose stream, face adapter injection).

Reference: `/root/reference/src/diffusers/models/transformers/transformer_wan_animate.py:986`.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_wan_animate import (
    WanAnimateTransformer3DModel,
)

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=(1, 2, 2),
    num_attention_heads=2,
    attention_head_dim=12,
    latent_channels=4,
    in_channels=12,  # 2*4 + 4
    out_channels=4,
    text_dim=16,
    freq_dim=32,
    ffn_dim=32,
    num_layers=2,
    image_dim=8,
    rope_max_seq_len=64,
    motion_encoder_size=16,
    motion_style_dim=8,
    motion_dim=4,
    motion_encoder_dim=8,
    face_encoder_hidden_dim=8,
    face_encoder_num_heads=2,
    inject_face_latents_blocks=1,
    motion_encoder_channel_sizes={"4": 8, "8": 8, "16": 8},
)


@pytest.mark.refparity
def test_wan_animate_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import WanAnimateTransformer3DModel as TorchModel

    torch.manual_seed(0)
    tm = TorchModel(**TINY).eval()
    m = WanAnimateTransformer3DModel(**TINY)
    params = convert_torch_state_dict(m, {k: v.detach().numpy() for k, v in tm.state_dict().items()})

    rng = np.random.RandomState(0)
    b, t_lat, h, w = 1, 2, 4, 4
    # face frames: with conv strides 1,2,2 the face encoder reduces T by 4;
    # the post-patchify video sequence ((T+1)/p_t * h/2 * w/2 = 12 tokens)
    # must divide by the reduced T+1 motion frames → pick 8 face frames → 2+1=3... use 4 → 1+1=2
    face_frames = 4
    ins = dict(
        hidden_states=rng.randn(b, 12, t_lat + 1, h, w).astype(np.float32),
        timestep=np.array([500], dtype=np.int64),
        encoder_hidden_states=rng.randn(b, 5, 16).astype(np.float32),
        encoder_hidden_states_image=rng.randn(b, 3, 8).astype(np.float32),
        pose_hidden_states=rng.randn(b, 4, t_lat, h, w).astype(np.float32),
        face_pixel_values=rng.randn(b, 3, face_frames, 16, 16).astype(np.float32),
    )

    with torch.no_grad():
        ref = tm(**{k: torch.from_numpy(v) for k, v in ins.items()}).sample.numpy()

    out = np.asarray(m(params, **{k: jnp.asarray(v) for k, v in ins.items()}).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))
