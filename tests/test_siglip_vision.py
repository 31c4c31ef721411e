"""SiglipVisionModel parity vs transformers (last_hidden_state + pooled head).

Reference consumer: `pipelines/hunyuan_video/pipeline_hunyuan_video_framepack.py:446`.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.text_encoders.siglip import SiglipVisionModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    hidden_size=16,
    intermediate_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    image_size=24,
    patch_size=8,
)


@pytest.mark.refparity
def test_siglip_vision_parity():
    torch = pytest.importorskip("torch")
    from transformers import SiglipVisionConfig, SiglipVisionModel as HFModel

    torch.manual_seed(0)
    hf = HFModel(SiglipVisionConfig(**TINY)).eval()
    m = SiglipVisionModel(**TINY)
    params = convert_torch_state_dict(m, {k: v.detach().numpy() for k, v in hf.state_dict().items()})

    x = np.random.RandomState(0).randn(2, 3, 24, 24).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(x))
    out = m(params, jnp.asarray(x))
    assert np.max(np.abs(np.asarray(out.last_hidden_state) - ref.last_hidden_state.numpy())) < 2e-4
    assert np.max(np.abs(np.asarray(out.pooler_output) - ref.pooler_output.numpy())) < 2e-4
