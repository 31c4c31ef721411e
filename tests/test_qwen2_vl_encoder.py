"""Qwen2.5-VL text tower parity vs transformers (text-only path; mRoPE
degenerates to 1D rope for text inputs)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")


def test_qwen2_5_vl_text_tower_parity(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2_5_VLForConditionalGeneration
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLConfig

    from diffusers_tpu.models.text_encoders.qwen2_vl import Qwen2_5_VLTextEncoder

    cfg = Qwen2_5_VLConfig(
        text_config=dict(vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2, rope_theta=1000000.0,
                         rms_norm_eps=1e-6, head_dim=8,
                         rope_scaling=dict(type="mrope", mrope_section=[2, 1, 1])),
        vision_config=dict(depth=1, hidden_size=16, intermediate_size=16, num_heads=2,
                           patch_size=4, temporal_patch_size=2, out_hidden_size=32),
    )
    tm = Qwen2_5_VLForConditionalGeneration(cfg)
    tm.eval()
    tm.save_pretrained(tmp_path)

    m, params = Qwen2_5_VLTextEncoder.from_pretrained(str(tmp_path))
    ids = np.array([[3, 17, 9, 100, 42, 5]], dtype=np.int32)
    mask = np.array([[1, 1, 1, 1, 1, 0]], dtype=np.int32)
    with torch.no_grad():
        ref = tm.model.language_model(input_ids=torch.from_numpy(ids).long(),
                                      attention_mask=torch.from_numpy(mask).long(),
                                      output_hidden_states=True)
    out = m(params, ids, attention_mask=mask, output_hidden_states=True)
    err = np.abs(np.asarray(out.hidden_states[-1]) - ref.hidden_states[-1].numpy())[mask.astype(bool)].max()
    assert err < 1e-4, err
