"""DreamLite: UNet parity vs torch reference + t2i/edit pipeline smoke.

Reference: `/root/reference/src/diffusers/models/unets/unet_dreamlite.py:1582`,
`/root/reference/src/diffusers/pipelines/dreamlite/pipeline_dreamlite.py:155`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.unets.unet_dreamlite import DreamLiteUNetModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    sample_size=8,
    in_channels=4,
    out_channels=4,
    down_block_types=("DreamLiteCrossAttnNoSelfAttnDownBlock2D", "DreamLiteCrossAttnDownBlock2D"),
    up_block_types=("DreamLiteCrossAttnUpBlock2D", "DreamLiteCrossAttnNoSelfAttnUpBlock2D"),
    block_out_channels=(8, 16),
    layers_per_block=1,
    norm_num_groups=4,
    cross_attention_dim=12,
    attention_head_dim=4,
    qk_norm="rms_norm",
    use_sep_conv=True,
    ff_mult=2,
    num_kv_heads=1,
    num_mid_layers=1,
)


@pytest.mark.refparity
def test_dreamlite_unet_parity():
    torch = pytest.importorskip("torch")
    from diffusers.models.unets.unet_dreamlite import DreamLiteUNetModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = DreamLiteUNetModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B = 2
    x = rng.randn(B, 4, 8, 16).astype(np.float32)  # wide (diptych-style) input
    ehs = rng.randn(B, 5, 12).astype(np.float32)
    t = np.array([400.0, 20.0], dtype=np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(x), timestep=torch.from_numpy(t),
                 encoder_hidden_states=torch.from_numpy(ehs)).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs)).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


class DummyTok:
    def __call__(self, text, max_length=None, padding=True, truncation=True,
                 return_tensors="np"):
        if isinstance(text, str):
            text = [text]
        # template prefix is 34 tokens in generate mode; emulate >= 40 tokens
        lens = [min(max_length or 64, 40 + len(t) % 5) for t in text]
        width = max(lens)
        ids = np.zeros((len(text), width), dtype=np.int64)
        mask = np.zeros((len(text), width), dtype=np.int64)
        for i, (t, n) in enumerate(zip(text, lens)):
            ids[i, :n] = [(hash(t) + j) % 90 + 3 for j in range(n)]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


class DummyProcessor(DummyTok):
    def __call__(self, text=None, images=None, padding=True, return_tensors="np"):
        out = DummyTok.__call__(self, text, max_length=80)
        # edit template prefix is 64 tokens; pad rows to >= 70
        ids, mask = out["input_ids"], out["attention_mask"]
        pad = 70 - ids.shape[1]
        if pad > 0:
            ids = np.pad(ids, ((0, 0), (0, pad)))
            mask = np.pad(mask, ((0, 0), (0, pad)))
        for i in range(ids.shape[0]):
            n = 66 + i
            ids[i, :n] = (ids[i, :n] + 1) % 90 + 2
            mask[i] = 0
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


def _pipe():
    from diffusers_tpu.models.autoencoders.autoencoder_tiny import AutoencoderTiny
    from diffusers_tpu.models.text_encoders.llama import LlamaModel
    from diffusers_tpu.pipelines.dreamlite import DreamLitePipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    unet = DreamLiteUNetModel(**dict(TINY, cross_attention_dim=16))
    te = LlamaModel(vocab_size=128, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                    num_attention_heads=2, num_key_value_heads=1, head_dim=8, qk_norm=True)
    vae = AutoencoderTiny(
        in_channels=3, out_channels=3, encoder_block_out_channels=(8, 8),
        decoder_block_out_channels=(8, 8), num_encoder_blocks=(1, 1),
        num_decoder_blocks=(1, 1), latent_channels=4,
    )
    return DreamLitePipeline(
        text_encoder=(te, te.init_params(key)),
        tokenizer=DummyTok(),
        processor=DummyProcessor(),
        vae=(vae, vae.init_params(key)),
        unet=(unet, unet.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
    ), key


def test_dreamlite_pipeline_generate_smoke():
    pipe, key = _pipe()
    out = pipe("a tiny house", height=16, width=16, num_inference_steps=2,
               guidance_scale=2.0, key=key, max_sequence_length=16, output_type="np")
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()


def test_dreamlite_pipeline_edit_smoke():
    pipe, key = _pipe()
    image = np.random.RandomState(0).rand(1, 3, 16, 16).astype(np.float32) * 2 - 1
    out = pipe("a red roof", image=image, height=16, width=16, num_inference_steps=2,
               guidance_scale=2.0, image_guidance_scale=1.5, key=key, output_type="latent")
    assert np.isfinite(np.asarray(out.images)).all()
