"""MiniMax-H3 transformer parity vs the torch reference (packed video+text+
audio sequence, per-row (timestep, modality) AdaLN, dual output heads).

Reference: `/root/reference/src/diffusers/models/transformers/transformer_minimax_h3.py:374`.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_minimax_h3 import (
    MiniMaxH3Transformer3DModel,
)

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    num_attention_heads=2,
    attention_head_dim=16,
    hidden_size=24,
    num_layers=2,
    num_refiner_layers=1,
    ffn_dim=48,
    in_channels=4,
    audio_in_channels=6,
    patch_size=(1, 2, 2),
    text_dim=12,
    freq_dim=16,
    time_embed_hidden_dim=24,
    time_embed_dim=20,
    rope_freq_dim=2,
)


@pytest.mark.refparity
def test_minimax_h3_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import MiniMaxH3Transformer3DModel as TorchModel

    torch.manual_seed(0)
    tm = TorchModel(**TINY).eval()
    m = MiniMaxH3Transformer3DModel(**TINY)
    params = convert_torch_state_dict(m, {k: v.detach().numpy() for k, v in tm.state_dict().items()})

    rng = np.random.RandomState(0)
    b = 2
    n_text, n_video, n_audio = 3, 8, 4
    S = n_text + n_video + n_audio
    # packed layout: [text, video, audio]
    text_idx = np.arange(0, n_text)
    video_idx = np.arange(n_text, n_text + n_video)
    audio_idx = np.arange(n_text + n_video, S)
    token_tags = np.concatenate([np.ones(n_text), np.zeros(n_video), 2 * np.ones(n_audio)]).astype(np.int64)
    # two distinct noise levels: conditioning rows at t0, targets at t1
    timestep = np.array([0.0, 0.7], dtype=np.float32)
    timestep_indices = np.concatenate([np.zeros(n_text), np.ones(n_video), np.ones(n_audio)]).astype(np.int64)
    position_ids = rng.randint(0, 8, (S, 3)).astype(np.int64)

    ins = dict(
        hidden_states=rng.randn(b, n_video, 4 * 1 * 2 * 2).astype(np.float32),
        audio_hidden_states=rng.randn(b, n_audio, 6).astype(np.float32),
        encoder_hidden_states=rng.randn(b, n_text, 12).astype(np.float32),
    )

    with torch.no_grad():
        ref = tm(
            **{k: torch.from_numpy(v) for k, v in ins.items()},
            timestep=torch.from_numpy(timestep),
            timestep_indices=torch.from_numpy(timestep_indices),
            token_tags=torch.from_numpy(token_tags),
            position_ids=torch.from_numpy(position_ids),
            video_indices=torch.from_numpy(video_idx),
            audio_indices=torch.from_numpy(audio_idx),
            text_indices=torch.from_numpy(text_idx),
        )

    out = m(
        params, **{k: jnp.asarray(v) for k, v in ins.items()},
        timestep=timestep, timestep_indices=timestep_indices, token_tags=token_tags,
        position_ids=position_ids, video_indices=video_idx, audio_indices=audio_idx,
        text_indices=text_idx,
    )
    assert np.asarray(out.sample).shape == tuple(ref.sample.shape)
    assert np.max(np.abs(np.asarray(out.sample) - ref.sample.numpy())) < 2e-3
    assert np.max(np.abs(np.asarray(out.audio_sample) - ref.audio_sample.numpy())) < 2e-3
