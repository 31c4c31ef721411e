"""Krea 2: transformer parity vs the torch reference + pipeline smoke.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_krea2.py:330`,
`/root/reference/src/diffusers/pipelines/krea2/pipeline_krea2.py:141`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_krea2 import Krea2Transformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    in_channels=16,
    num_layers=2,
    attention_head_dim=16,
    num_attention_heads=4,
    num_key_value_heads=2,
    intermediate_size=48,
    timestep_embed_dim=32,
    text_hidden_dim=24,
    num_text_layers=3,
    text_num_attention_heads=2,
    text_num_key_value_heads=2,
    text_intermediate_size=32,
    num_layerwise_text_blocks=1,
    num_refiner_text_blocks=1,
    axes_dims_rope=(8, 4, 4),
    rope_theta=1000.0,
)


@pytest.mark.refparity
def test_krea2_parity():
    torch = pytest.importorskip("torch")
    from diffusers import Krea2Transformer2DModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    with torch.no_grad():
        # zero-init modulation tables and zero-centered RMSNorm scales
        # degenerate; randomize so modulation paths are exercised
        for n, p in tm.named_parameters():
            if (p == 0).all():
                p.data.normal_(0.0, 0.05)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = Krea2Transformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, S_img, S_txt = 2, 16, 7
    x = rng.randn(B, S_img, 16).astype(np.float32)
    ehs = rng.randn(B, S_txt, 3, 24).astype(np.float32)
    t = np.array([0.3, 0.8], dtype=np.float32)
    mask = np.ones((B, S_txt), dtype=bool)
    mask[0, 5:] = False
    pos_ids = np.zeros((S_txt + S_img, 3), np.float32)
    pos_ids[S_txt:, 1] = np.repeat(np.arange(4), 4)
    pos_ids[S_txt:, 2] = np.tile(np.arange(4), 4)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), encoder_hidden_states=torch.from_numpy(ehs),
            timestep=torch.from_numpy(t), position_ids=torch.from_numpy(pos_ids),
            encoder_attention_mask=torch.from_numpy(mask),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t), position_ids=pos_ids,
          encoder_attention_mask=jnp.asarray(mask)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3, np.max(np.abs(out - ref))


class DummyQwen3VLTok:
    pad_token_id = 0

    def __call__(self, text, truncation=True, padding=None, max_length=None, return_tensors="np"):
        if isinstance(text, str):
            text = [text]
        if max_length is None:  # suffix call
            n = 5
            ids = np.array([[(hash(p) + j) % 90 + 3 for j in range(n)] for p in text])
            return {"input_ids": ids, "attention_mask": np.ones_like(ids)}
        ids = np.zeros((len(text), max_length), dtype=np.int64)
        mask = np.zeros((len(text), max_length), dtype=np.int64)
        for i, p in enumerate(text):
            n = min(max_length, 36 + len(p) % 5)
            ids[i, :n] = [(hash(p) + j) % 90 + 3 for j in range(n)]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


def get_dummy_pipeline():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_qwenimage import AutoencoderKLQwenImage
    from diffusers_tpu.models.text_encoders.llama import LlamaModel
    from diffusers_tpu.pipelines.krea2 import Krea2Pipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    transformer = Krea2Transformer2DModel(**TINY)
    te = LlamaModel(vocab_size=128, hidden_size=24, intermediate_size=48, num_hidden_layers=3,
                    num_attention_heads=2, num_key_value_heads=1, head_dim=12, qk_norm=True)
    vae = AutoencoderKLQwenImage(
        base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1, attn_scales=[],
        temperal_downsample=[False], latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
    )
    return Krea2Pipeline(
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=DummyQwen3VLTok(),
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
        text_encoder_select_layers=(1, 2, 3),
        is_distilled=True,
    )


def test_krea2_pipeline_smoke():
    key = jax.random.PRNGKey(0)
    pipe = get_dummy_pipeline()
    out = pipe("a glass orb on sand", height=16, width=16, num_inference_steps=2,
               guidance_scale=1.0, key=key, max_sequence_length=48, output_type="np")
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()
