"""LTX2TextConnectors parity vs torch reference (tiny configs)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.pipelines.ltx2.connectors import LTX2TextConnectors

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    caption_channels=8,
    text_proj_in_factor=3,
    video_connector_num_attention_heads=2,
    video_connector_attention_head_dim=4,
    video_connector_num_layers=1,
    video_connector_num_learnable_registers=4,
    audio_connector_num_attention_heads=2,
    audio_connector_attention_head_dim=4,
    audio_connector_num_layers=1,
    audio_connector_num_learnable_registers=4,
)


def _compare(config, batch=2, seq=8, padding_side="left", seed=0):
    torch = pytest.importorskip("torch")
    from diffusers.pipelines.ltx2.connectors import LTX2TextConnectors as TorchConnectors

    tm = TorchConnectors(**config)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    ours = LTX2TextConnectors(**config)
    params = convert_torch_state_dict(ours, sd)

    rng = np.random.RandomState(seed)
    x = rng.randn(batch, seq, config["caption_channels"] * config["text_proj_in_factor"]).astype(np.float32)
    mask = np.ones((batch, seq), dtype=np.int64)
    mask[0, :3] = 0  # left padding
    mask[1, :1] = 0

    with torch.no_grad():
        ref_v, ref_a, ref_m = tm(torch.from_numpy(x), torch.from_numpy(mask), padding_side=padding_side)
    got_v, got_a, got_m = ours(params, jnp.asarray(x), jnp.asarray(mask), padding_side=padding_side)

    np.testing.assert_array_equal(np.asarray(got_m), ref_m.numpy())
    for got, ref, tag in ((got_v, ref_v, "video"), (got_a, ref_a, "audio")):
        err = np.max(np.abs(np.asarray(got) - ref.numpy()))
        assert err < 5e-4, f"{tag} connector diverges: {err}"


def test_connectors_parity():
    _compare(TINY)


def test_connectors_parity_no_registers_right_pad():
    cfg = dict(TINY)
    cfg.update(video_connector_num_learnable_registers=None,
               audio_connector_num_learnable_registers=None)
    _compare(cfg, padding_side="right")


def test_connectors_parity_per_modality_split_rope():
    cfg = dict(TINY)
    cfg.update(per_modality_projections=True, video_hidden_dim=8, audio_hidden_dim=8,
               rope_type="split", video_gated_attn=True, audio_gated_attn=True)
    _compare(cfg)
