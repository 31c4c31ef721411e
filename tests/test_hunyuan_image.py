"""HunyuanImage-2.1: transformer + 32x VAE parity vs the torch reference and a
reference-layout from_pretrained -> generate with the APG-mix OCR guider.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_hunyuanimage.py:617`,
`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_hunyuanimage.py:412`,
`/root/reference/src/diffusers/pipelines/hunyuan_image/pipeline_hunyuanimage.py:160`.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl_hunyuanimage import AutoencoderKLHunyuanImage
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_hunyuanimage import HunyuanImageTransformer2DModel

sys.path.insert(0, "/root/reference/src")

TF_TINY = dict(
    in_channels=8,
    out_channels=8,
    num_attention_heads=2,
    attention_head_dim=12,
    num_layers=1,
    num_single_layers=1,
    num_refiner_layers=1,
    patch_size=(1, 1),
    guidance_embeds=True,
    text_embed_dim=16,
    text_embed_2_dim=10,
    rope_axes_dim=(6, 6),
)

VAE_TINY = dict(
    in_channels=3,
    out_channels=3,
    latent_channels=4,
    block_out_channels=(32, 64),
    layers_per_block=1,
    spatial_compression_ratio=2,
    sample_size=32,
    scaling_factor=0.75,
)


@pytest.mark.refparity
def test_hunyuanimage_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import HunyuanImageTransformer2DModel as TorchModel

    tm = TorchModel(**TF_TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = HunyuanImageTransformer2DModel(**TF_TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B = 2
    x = rng.randn(B, 8, 4, 6).astype(np.float32)
    ehs = rng.randn(B, 7, 16).astype(np.float32)
    mask = np.ones((B, 7), dtype=np.int64)
    mask[0, 5:] = 0
    ehs2 = rng.randn(B, 5, 10).astype(np.float32)
    mask2 = np.ones((B, 5), dtype=np.int64)
    mask2[1, 2:] = 0
    t = np.array([100.0, 700.0], dtype=np.float32)
    g = np.array([4000.0, 4000.0], dtype=np.float32)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ehs),
            encoder_attention_mask=torch.from_numpy(mask),
            encoder_hidden_states_2=torch.from_numpy(ehs2),
            encoder_attention_mask_2=torch.from_numpy(mask2),
            guidance=torch.from_numpy(g),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs), jnp.asarray(mask),
          encoder_hidden_states_2=jnp.asarray(ehs2), encoder_attention_mask_2=jnp.asarray(mask2),
          guidance=jnp.asarray(g)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3, np.max(np.abs(out - ref))


@pytest.mark.refparity
def test_hunyuanimage_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKLHunyuanImage as TorchVAE

    tm = TorchVAE(**VAE_TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLHunyuanImage(**VAE_TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_moments = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    post = m.encode(params, jnp.asarray(x)).latent_dist
    ours = np.asarray(post.parameters)
    assert ours.shape == ref_moments.shape
    assert np.max(np.abs(ours - ref_moments)) < 5e-4, np.max(np.abs(ours - ref_moments))

    z = post.mode()
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(np.asarray(z))).sample.numpy()
    dec = np.asarray(m.decode(params, z).sample)
    assert dec.shape == ref_dec.shape
    assert np.max(np.abs(dec - ref_dec)) < 5e-3, np.max(np.abs(dec - ref_dec))


class DummyQwenTok:
    def __call__(self, text, max_length=64, **kw):
        if isinstance(text, str):
            text = [text]
        ids = np.zeros((len(text), max_length), dtype=np.int64)
        mask = np.zeros((len(text), max_length), dtype=np.int64)
        for i, p in enumerate(text):
            n = min(max_length, 38 + len(p) % 5)
            ids[i, :n] = [(hash(p) + j) % 100 + 1 for j in range(n)]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


class DummyByT5Tok:
    def __call__(self, text, max_length=128, **kw):
        ids = np.zeros((1, max_length), dtype=np.int64)
        mask = np.zeros((1, max_length), dtype=np.int64)
        n = min(max_length, max(4, len(text) % 11 + 4))
        ids[0, :n] = [(hash(text) + j) % 90 + 3 for j in range(n)]
        mask[0, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


@pytest.mark.refparity
def test_hunyuanimage_from_pretrained_generate(tmp_path):
    torch = pytest.importorskip("torch")
    from diffusers import (
        AutoencoderKLHunyuanImage as TorchVAE,
        FlowMatchEulerDiscreteScheduler as TorchSched,
        HunyuanImageTransformer2DModel as TorchTf,
    )
    from transformers import T5Config, T5EncoderModel

    from diffusers_tpu.guiders.adaptive_projected_guidance_mix import AdaptiveProjectedMixGuidance
    from diffusers_tpu.pipelines.hunyuan_image import HunyuanImagePipeline
    from tests.test_kandinsky5 import _tiny_qwen25vl

    torch.manual_seed(0)
    # latent channels must match the VAE's (4)
    cfg = dict(TF_TINY, text_embed_dim=12, guidance_embeds=False, in_channels=4, out_channels=4)
    TorchTf(**cfg).save_pretrained(tmp_path / "transformer")
    TorchVAE(**VAE_TINY).save_pretrained(tmp_path / "vae")
    _tiny_qwen25vl(torch).save_pretrained(tmp_path / "text_encoder")
    T5EncoderModel(T5Config(d_model=10, d_ff=24, num_layers=2, num_heads=2, d_kv=5,
                            vocab_size=384, feed_forward_proj="gated-gelu",
                            tie_word_embeddings=False)).save_pretrained(tmp_path / "text_encoder_2")
    TorchSched(shift=5.0).save_pretrained(tmp_path / "scheduler")

    index = {
        "_class_name": "HunyuanImagePipeline", "_diffusers_version": "0.40.0.dev0",
        "transformer": ["diffusers", "HunyuanImageTransformer2DModel"],
        "vae": ["diffusers", "AutoencoderKLHunyuanImage"],
        "text_encoder": ["transformers", "Qwen2_5_VLForConditionalGeneration"],
        "tokenizer": [None, None],
        "text_encoder_2": ["transformers", "T5EncoderModel"],
        "tokenizer_2": [None, None],
        "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
    }
    with open(os.path.join(tmp_path, "model_index.json"), "w") as f:
        json.dump(index, f)

    pipe = HunyuanImagePipeline.from_pretrained(
        str(tmp_path), tokenizer=DummyQwenTok(), tokenizer_2=DummyByT5Tok(),
        ocr_guider=AdaptiveProjectedMixGuidance(guidance_scale=3.0),
        guider=AdaptiveProjectedMixGuidance(guidance_scale=2.0),
    )
    # quoted span -> glyph text -> ByT5 stream + OCR guider path
    out = pipe('a neon sign reading "OPEN"', negative_prompt="blurry", height=16, width=16,
               num_inference_steps=2, key=jax.random.PRNGKey(0), max_sequence_length=8,
               output_type="np")
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()

    # no quotes -> zero glyph embeds -> default guider path
    out2 = pipe("a misty forest", negative_prompt="", height=16, width=16,
                num_inference_steps=2, key=jax.random.PRNGKey(1), max_sequence_length=8,
                output_type="latent")
    assert np.isfinite(np.asarray(out2.images)).all()
