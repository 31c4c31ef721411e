"""Ideogram 4: packed-sequence transformer parity vs torch reference +
pipeline smoke (separate unconditional transformer, logit-normal schedule).

Reference: `/root/reference/src/diffusers/models/transformers/transformer_ideogram4.py:278`,
`/root/reference/src/diffusers/pipelines/ideogram4/pipeline_ideogram4.py:141`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_ideogram4 import (
    IMAGE_POSITION_OFFSET,
    LLM_TOKEN_INDICATOR,
    OUTPUT_IMAGE_INDICATOR,
    Ideogram4Transformer2DModel,
)

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    in_channels=16,
    num_layers=2,
    attention_head_dim=12,
    num_attention_heads=2,
    intermediate_size=48,
    adaln_dim=16,
    llm_features_dim=20,
    rope_theta=5_000_000,
    mrope_section=(2, 2, 2),
)


def _packed_inputs(rng, B=2, n_text=4, grid=3):
    n_img = grid * grid
    L = n_text + n_img
    x = rng.randn(B, L, 16).astype(np.float32)
    ehs = rng.randn(B, L, 20).astype(np.float32)
    t = np.array([0.2, 0.7], dtype=np.float32)
    pos = np.zeros((B, L, 3), np.int64)
    tp = np.arange(n_text)
    pos[:, :n_text] = np.stack([tp, tp, tp], axis=1)
    h_idx = np.repeat(np.arange(grid), grid)
    w_idx = np.tile(np.arange(grid), grid)
    pos[:, n_text:] = np.stack([np.zeros_like(h_idx), h_idx, w_idx], axis=1) + IMAGE_POSITION_OFFSET
    seg = np.ones((B, L), np.int64)
    seg[0, 0] = -1  # one padding slot
    ind = np.full((B, L), LLM_TOKEN_INDICATOR, np.int64)
    ind[:, n_text:] = OUTPUT_IMAGE_INDICATOR
    ind[0, 0] = 0
    return x, ehs, t, pos, seg, ind


@pytest.mark.refparity
def test_ideogram4_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers.models.transformers.transformer_ideogram4 import (
        Ideogram4Transformer2DModel as TorchModel,
    )

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = Ideogram4Transformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x, ehs, t, pos, seg, ind = _packed_inputs(rng)
    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ehs),
            position_ids=torch.from_numpy(pos), segment_ids=torch.from_numpy(seg),
            indicator=torch.from_numpy(ind),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs), pos,
          jnp.asarray(seg), jnp.asarray(ind)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3, np.max(np.abs(out - ref))


class DummyQwen3VLTok:
    def apply_chat_template(self, messages, add_generation_prompt=True, tokenize=False):
        return str(messages[0]["content"][0]["text"])

    def __call__(self, text, return_tensors="np", add_special_tokens=False):
        n = 5 + len(text) % 4
        return {"input_ids": np.asarray([[(hash(text) + j) % 90 + 3 for j in range(n)]])}


def test_ideogram4_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_flux2 import AutoencoderKLFlux2
    from diffusers_tpu.models.text_encoders.llama import LlamaModel
    from diffusers_tpu.pipelines.ideogram4 import Ideogram4Pipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    # 36-layer tap set needs num_hidden_layers=36; use a thin tower
    te = LlamaModel(vocab_size=128, hidden_size=4, intermediate_size=8, num_hidden_layers=36,
                    num_attention_heads=2, num_key_value_heads=1, head_dim=2, qk_norm=True)
    tiny = dict(TINY, llm_features_dim=4 * 13)
    transformer = Ideogram4Transformer2DModel(**tiny)
    uncond = Ideogram4Transformer2DModel(**tiny)
    vae = AutoencoderKLFlux2(
        in_channels=3, out_channels=3,
        down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
        up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
        block_out_channels=(8, 8), layers_per_block=1, latent_channels=4, norm_num_groups=4,
    )
    pipe = Ideogram4Pipeline(
        scheduler=FlowMatchEulerDiscreteScheduler(),
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=DummyQwen3VLTok(),
        transformer=(transformer, transformer.init_params(key)),
        unconditional_transformer=(uncond, uncond.init_params(jax.random.PRNGKey(1))),
    )
    out = pipe("a typographic poster", height=16, width=16, num_inference_steps=2,
               guidance_scale=3.0, key=key, max_sequence_length=16, output_type="np")
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()
