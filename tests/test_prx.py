"""PRX: transformer parity vs the torch reference, T5Gemma tower parity, and
reference-layout from_pretrained -> generate.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_prx.py:631`,
`/root/reference/src/diffusers/pipelines/prx/pipeline_prx.py:286`.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_prx import PRXTransformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    in_channels=4,
    patch_size=2,
    context_in_dim=12,
    hidden_size=32,
    mlp_ratio=2.0,
    num_heads=2,
    depth=2,
    axes_dim=[8, 8],
)


@pytest.mark.refparity
@pytest.mark.parametrize("variant", ["base", "pixel"])
def test_prx_transformer_parity(variant):
    torch = pytest.importorskip("torch")
    from diffusers import PRXTransformer2DModel as TorchModel

    kwargs = dict(TINY)
    if variant == "pixel":
        kwargs.update(bottleneck_size=8, resolution_embeds=True)
    tm = TorchModel(**kwargs)
    tm.eval()
    with torch.no_grad():
        for n, p in tm.named_parameters():
            if (p == 0).all():
                p.data.normal_(0.0, 0.05)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = PRXTransformer2DModel(**kwargs)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B = 2
    x = rng.randn(B, 4, 8, 8).astype(np.float32)
    ehs = rng.randn(B, 7, 12).astype(np.float32)
    mask = np.ones((B, 7), dtype=bool)
    mask[0, 5:] = False
    t = np.array([0.3, 0.9], dtype=np.float32)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ehs),
            attention_mask=torch.from_numpy(mask),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs),
          attention_mask=jnp.asarray(mask)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3, np.max(np.abs(out - ref))


@pytest.mark.refparity
def test_t5gemma_encoder_parity(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import T5GemmaConfig, T5GemmaEncoderModel as TorchModel, T5GemmaModuleConfig

    from diffusers_tpu.models.text_encoders.gemma import T5GemmaEncoderModel

    cfg = T5GemmaModuleConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, head_dim=8, sliding_window=3,
        layer_types=["sliding_attention", "full_attention"], query_pre_attn_scalar=8,
        attn_logit_softcapping=50.0,
    )
    full = T5GemmaConfig(encoder=cfg, decoder=cfg, is_encoder_decoder=False)
    full.encoder.vocab_size = 64
    tm = TorchModel(full)
    tm.eval()
    tm.save_pretrained(tmp_path)
    m, params = T5GemmaEncoderModel.from_pretrained(str(tmp_path))

    ids = np.array([[3, 17, 9, 60, 42, 5, 1, 2]], dtype=np.int32)
    mask = np.array([[1, 1, 1, 1, 1, 1, 1, 0]], dtype=np.int32)
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids).long(),
                 attention_mask=torch.from_numpy(mask).long()).last_hidden_state.numpy()
    out = np.asarray(m(params, ids, attention_mask=mask).last_hidden_state)
    err = np.abs(out - ref)[np.asarray(mask, bool)].max()
    assert err < 1e-4, err


class DummyT5GemmaTok:
    def __call__(self, prompts, padding=None, max_length=16, truncation=True, return_tensors="np"):
        ids = np.zeros((len(prompts), max_length), dtype=np.int64)
        mask = np.zeros((len(prompts), max_length), dtype=np.int64)
        for i, p in enumerate(prompts):
            n = min(max_length, max(3, len(p) % 8 + 3))
            ids[i, :n] = [(hash(p) + j) % 60 + 1 for j in range(n)]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


@pytest.mark.refparity
def test_prx_from_pretrained_generate(tmp_path):
    torch = pytest.importorskip("torch")
    from diffusers import (
        AutoencoderKL as TorchVAE,
        FlowMatchEulerDiscreteScheduler as TorchSched,
        PRXTransformer2DModel as TorchTf,
    )
    from transformers import T5GemmaConfig, T5GemmaEncoderModel as TorchTE, T5GemmaModuleConfig

    from diffusers_tpu.pipelines.prx import PRXPipeline

    torch.manual_seed(0)
    TorchTf(**TINY).save_pretrained(tmp_path / "transformer")
    TorchVAE(
        in_channels=3, out_channels=3, block_out_channels=(8, 8, 8, 8),
        down_block_types=("DownEncoderBlock2D",) * 4, up_block_types=("UpDecoderBlock2D",) * 4,
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=32,
        scaling_factor=0.3,
    ).save_pretrained(tmp_path / "vae")
    mcfg = T5GemmaModuleConfig(
        vocab_size=64, hidden_size=12, intermediate_size=24, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, head_dim=6, sliding_window=4,
        layer_types=["sliding_attention", "full_attention"], query_pre_attn_scalar=6,
    )
    full = T5GemmaConfig(encoder=mcfg, decoder=mcfg, is_encoder_decoder=False)
    full.encoder.vocab_size = 64
    TorchTE(full).save_pretrained(tmp_path / "text_encoder")
    TorchSched(shift=3.0).save_pretrained(tmp_path / "scheduler")

    index = {
        "_class_name": "PRXPipeline", "_diffusers_version": "0.40.0.dev0",
        "transformer": ["diffusers", "PRXTransformer2DModel"],
        "vae": ["diffusers", "AutoencoderKL"],
        "text_encoder": ["transformers", "T5GemmaEncoderModel"],
        "tokenizer": [None, None],
        "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
    }
    with open(os.path.join(tmp_path, "model_index.json"), "w") as f:
        json.dump(index, f)

    pipe = PRXPipeline.from_pretrained(str(tmp_path), tokenizer=DummyT5GemmaTok())
    out = pipe("a ceramic bowl of plums", negative_prompt="blurry", height=32, width=32,
               num_inference_steps=2, guidance_scale=4.0, key=jax.random.PRNGKey(0),
               max_sequence_length=12, output_type="np")
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()
