"""HunyuanVideo 1.5: transformer + 16x/4x causal VAE parity vs the torch
reference and a reference-layout from_pretrained -> t2v/i2v generate.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_hunyuan_video15.py:510`,
`/root/reference/src/diffusers/models/autoencoders/autoencoder_kl_hunyuanvideo15.py:634`,
`/root/reference/src/diffusers/pipelines/hunyuan_video1_5/pipeline_hunyuan_video1_5.py:166`.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl_hunyuanvideo15 import AutoencoderKLHunyuanVideo15
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_hunyuan_video15 import HunyuanVideo15Transformer3DModel

sys.path.insert(0, "/root/reference/src")

TF_TINY = dict(
    in_channels=5,
    out_channels=2,
    num_attention_heads=2,
    attention_head_dim=12,
    num_layers=2,
    num_refiner_layers=1,
    patch_size=1,
    patch_size_t=1,
    text_embed_dim=16,
    text_embed_2_dim=10,
    image_embed_dim=12,
    rope_axes_dim=(4, 4, 4),
)

VAE_TINY = dict(
    in_channels=3,
    out_channels=3,
    latent_channels=4,
    block_out_channels=(16, 32, 32),
    layers_per_block=1,
    spatial_compression_ratio=4,
    temporal_compression_ratio=2,
    scaling_factor=0.9,
)


@pytest.mark.refparity
@pytest.mark.parametrize("t2v", [False, True])
def test_hunyuan_video15_transformer_parity(t2v):
    torch = pytest.importorskip("torch")
    from diffusers import HunyuanVideo15Transformer3DModel as TorchModel

    tm = TorchModel(**TF_TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = HunyuanVideo15Transformer3DModel(**TF_TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B = 2
    x = rng.randn(B, 5, 2, 4, 6).astype(np.float32)
    ehs = rng.randn(B, 7, 16).astype(np.float32)
    mask = np.ones((B, 7), dtype=np.int64)
    mask[0, 5:] = 0
    ehs2 = rng.randn(B, 5, 10).astype(np.float32)
    mask2 = np.ones((B, 5), dtype=np.int64)
    mask2[1, 2:] = 0
    img = np.zeros((B, 3, 12), np.float32) if t2v else rng.randn(B, 3, 12).astype(np.float32)
    t = np.array([100.0, 700.0], dtype=np.float32)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ehs),
            encoder_attention_mask=torch.from_numpy(mask),
            encoder_hidden_states_2=torch.from_numpy(ehs2),
            encoder_attention_mask_2=torch.from_numpy(mask2),
            image_embeds=torch.from_numpy(img),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs), jnp.asarray(mask),
          encoder_hidden_states_2=jnp.asarray(ehs2), encoder_attention_mask_2=jnp.asarray(mask2),
          image_embeds=jnp.asarray(img)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


@pytest.mark.refparity
def test_hunyuan_video15_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKLHunyuanVideo15 as TorchVAE

    tm = TorchVAE(**VAE_TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLHunyuanVideo15(**VAE_TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    # 3 frames (first-frame special path + temporal downsample), 8x8 spatial
    x = rng.randn(1, 3, 3, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref_moments = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    post = m.encode(params, jnp.asarray(x))
    ours = np.asarray(post.parameters)
    assert ours.shape == ref_moments.shape
    assert np.max(np.abs(ours - ref_moments)) < 2e-3, np.max(np.abs(ours - ref_moments))

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
            n = min(max_length, 10 + len(p) % 5)
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


def _build_pipe(tmp_path, torch, cls_name):
    from diffusers import (
        AutoencoderKLHunyuanVideo15 as TorchVAE,
        FlowMatchEulerDiscreteScheduler as TorchSched,
        HunyuanVideo15Transformer3DModel as TorchTf,
    )
    from transformers import T5Config, T5EncoderModel

    from tests.test_kandinsky5 import _tiny_qwen25vl

    torch.manual_seed(0)
    # in_channels = 2 * latent_channels + 1 (latents | cond | mask)
    cfg = dict(TF_TINY, num_layers=1, text_embed_dim=12, in_channels=9, out_channels=4,
               target_size=32)
    TorchTf(**cfg).save_pretrained(tmp_path / "transformer")
    TorchVAE(**VAE_TINY).save_pretrained(tmp_path / "vae")
    _tiny_qwen25vl(torch).save_pretrained(tmp_path / "text_encoder")
    T5EncoderModel(T5Config(d_model=10, d_ff=24, num_layers=2, num_heads=2, d_kv=5,
                            vocab_size=384, feed_forward_proj="gated-gelu",
                            tie_word_embeddings=False)).save_pretrained(tmp_path / "text_encoder_2")
    TorchSched(shift=5.0).save_pretrained(tmp_path / "scheduler")

    index = {
        "_class_name": cls_name, "_diffusers_version": "0.40.0.dev0",
        "transformer": ["diffusers", "HunyuanVideo15Transformer3DModel"],
        "vae": ["diffusers", "AutoencoderKLHunyuanVideo15"],
        "text_encoder": ["transformers", "Qwen2_5_VLForConditionalGeneration"],
        "tokenizer": [None, None],
        "text_encoder_2": ["transformers", "T5EncoderModel"],
        "tokenizer_2": [None, None],
        "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
    }
    with open(os.path.join(tmp_path, "model_index.json"), "w") as f:
        json.dump(index, f)


@pytest.mark.refparity
def test_hunyuan_video15_from_pretrained_generate(tmp_path):
    torch = pytest.importorskip("torch")
    from diffusers_tpu.guiders import ClassifierFreeGuidance
    from diffusers_tpu.pipelines.hunyuan_video1_5 import HunyuanVideo15Pipeline

    _build_pipe(tmp_path, torch, "HunyuanVideo15Pipeline")
    pipe = HunyuanVideo15Pipeline.from_pretrained(
        str(tmp_path), tokenizer=DummyQwenTok(), tokenizer_2=DummyByT5Tok(),
        guider=ClassifierFreeGuidance(guidance_scale=3.0),
    )
    # shrink the fixed token budgets for the tiny test
    pipe.tokenizer_max_length = 12
    pipe.tokenizer_2_max_length = 8
    pipe.prompt_template_encode_start_idx = 2
    pipe.vision_num_semantic_tokens = 4

    out = pipe('a neon sign reading "OPEN"', negative_prompt="blurry",
               height=8, width=8, num_frames=3, num_inference_steps=2,
               key=jax.random.PRNGKey(0), output_type="np")
    video = np.asarray(out.frames)
    assert video.shape == (1, 3, 8, 8, 3)
    assert np.isfinite(video).all()


@pytest.mark.refparity
def test_hunyuan_video15_i2v_from_pretrained_generate(tmp_path):
    torch = pytest.importorskip("torch")
    from diffusers_tpu.guiders import ClassifierFreeGuidance
    from diffusers_tpu.pipelines.hunyuan_video1_5 import HunyuanVideo15ImageToVideoPipeline

    _build_pipe(tmp_path, torch, "HunyuanVideo15ImageToVideoPipeline")
    pipe = HunyuanVideo15ImageToVideoPipeline.from_pretrained(
        str(tmp_path), tokenizer=DummyQwenTok(), tokenizer_2=DummyByT5Tok(),
        guider=ClassifierFreeGuidance(guidance_scale=3.0),
        image_encoder=None, feature_extractor=None,
    )
    pipe.tokenizer_max_length = 12
    pipe.tokenizer_2_max_length = 8
    pipe.prompt_template_encode_start_idx = 2
    pipe.vision_num_semantic_tokens = 4

    rng = np.random.RandomState(0)
    image = rng.uniform(-1, 1, (3, 8, 8)).astype(np.float32)
    image_embeds = jnp.asarray(rng.randn(1, 4, 12).astype(np.float32))
    out = pipe(image=image, prompt="a cat", negative_prompt="",
               height=8, width=8, num_frames=3, num_inference_steps=2,
               key=jax.random.PRNGKey(0), image_embeds=image_embeds, output_type="np")
    video = np.asarray(out.frames)
    assert video.shape == (1, 3, 8, 8, 3)
    assert np.isfinite(video).all()
