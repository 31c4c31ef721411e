"""GLM-Image: DiT parity (incl. the functional condition-image KV-cache vs
the reference's mutable cache) and a from_pretrained t2i/i2i generate with
precomputed prior tokens.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_glm_image.py:503`,
`/root/reference/src/diffusers/pipelines/glm_image/pipeline_glm_image.py:161`.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_glm_image import GlmImageTransformer2DModel

sys.path.insert(0, "/root/reference/src")

TF_TINY = dict(
    patch_size=2,
    in_channels=4,
    out_channels=4,
    num_layers=2,
    attention_head_dim=8,
    num_attention_heads=2,
    text_embed_dim=10,
    time_embed_dim=16,
    condition_dim=8,
    prior_vq_quantizer_codebook_size=32,
)


def _models():
    torch = pytest.importorskip("torch")
    from diffusers import GlmImageTransformer2DModel as TorchModel

    tm = TorchModel(**TF_TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = GlmImageTransformer2DModel(**TF_TINY)
    params = convert_torch_state_dict(m, sd)
    return torch, tm, m, params


@pytest.mark.refparity
def test_glm_image_transformer_parity():
    torch, tm, m, params = _models()
    rng = np.random.RandomState(0)
    B = 2
    x = rng.randn(B, 4, 8, 12).astype(np.float32)
    txt = rng.randn(B, 6, 10).astype(np.float32)
    prior = rng.randint(0, 32, (B, 24)).astype(np.int64)  # (8/2)*(12/2)
    drop = np.zeros((B, 24), bool)
    drop[1, :] = True  # uncond branch zeroing
    t = np.array([100.0, 800.0], np.float32)
    tsize = np.array([[64.0, 96.0]] * B, np.float32)
    crop = np.zeros((B, 2), np.float32)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), encoder_hidden_states=torch.from_numpy(txt),
            prior_token_id=torch.from_numpy(prior), prior_token_drop=torch.from_numpy(drop),
            timestep=torch.from_numpy(t), target_size=torch.from_numpy(tsize),
            crop_coords=torch.from_numpy(crop)).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), jnp.asarray(txt), jnp.asarray(prior),
                       jnp.asarray(drop), jnp.asarray(t), jnp.asarray(tsize),
                       jnp.asarray(crop)).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


@pytest.mark.refparity
def test_glm_image_kv_cache_parity():
    torch, tm, m, params = _models()
    from diffusers.models.transformers.transformer_glm_image import GlmImageKVCache

    rng = np.random.RandomState(1)
    cond_lat = rng.randn(1, 4, 8, 8).astype(np.float32)
    cond_prior = rng.randint(0, 32, (1, 16)).astype(np.int64)
    x = rng.randn(1, 4, 8, 12).astype(np.float32)
    txt = rng.randn(1, 5, 10).astype(np.float32)
    prior = rng.randint(0, 32, (1, 24)).astype(np.int64)
    drop = np.zeros((1, 24), bool)
    t = np.array([500.0], np.float32)
    tsize = np.array([[64.0, 96.0]], np.float32)
    crop = np.zeros((1, 2), np.float32)

    # reference: write then read through the mutable cache
    kv = GlmImageKVCache(num_layers=TF_TINY["num_layers"])
    with torch.no_grad():
        kv.set_mode("write")
        tm(hidden_states=torch.from_numpy(cond_lat),
           encoder_hidden_states=torch.zeros(1, 0, 10),
           prior_token_id=torch.from_numpy(cond_prior),
           prior_token_drop=torch.zeros(1, 16, dtype=torch.bool),
           timestep=torch.zeros(1), target_size=torch.tensor([[64.0, 64.0]]),
           crop_coords=torch.zeros(1, 2), kv_caches=kv)
        kv.next_sample()
        kv.set_mode("read")
        ref = tm(hidden_states=torch.from_numpy(x), encoder_hidden_states=torch.from_numpy(txt),
                 prior_token_id=torch.from_numpy(prior), prior_token_drop=torch.from_numpy(drop),
                 timestep=torch.from_numpy(t), target_size=torch.from_numpy(tsize),
                 crop_coords=torch.from_numpy(crop), kv_caches=kv).sample.numpy()

    # ours: functional return_kv -> kv_cache
    write = m(params, jnp.asarray(cond_lat), jnp.zeros((1, 0, 10)), jnp.asarray(cond_prior),
              jnp.zeros((1, 16), bool), jnp.zeros((1,)), jnp.asarray([[64.0, 64.0]]),
              jnp.zeros((1, 2)), return_kv=True)
    out = np.asarray(m(params, jnp.asarray(x), jnp.asarray(txt), jnp.asarray(prior),
                       jnp.asarray(drop), jnp.asarray(t), jnp.asarray(tsize),
                       jnp.asarray(crop), kv_cache=write.kv_cache).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


class DummyByT5Tok:
    pad_token_id = 0

    def __call__(self, texts, max_length=64, truncation=True, **kw):
        ids = []
        for t in texts:
            n = max(3, min(max_length, len(t) % 9 + 3))
            ids.append([(hash(t) + j) % 200 + 3 for j in range(n)])
        return {"input_ids": ids}


@pytest.mark.refparity
def test_glm_image_from_pretrained_generate(tmp_path):
    torch = pytest.importorskip("torch")
    from diffusers import (
        AutoencoderKL as TorchVAE,
        FlowMatchEulerDiscreteScheduler as TorchSched,
        GlmImageTransformer2DModel as TorchTf,
    )
    from transformers import T5Config, T5EncoderModel

    from diffusers_tpu.pipelines.glm_image import GlmImagePipeline

    torch.manual_seed(0)
    cfg = dict(TF_TINY)
    TorchTf(**cfg).save_pretrained(tmp_path / "transformer")
    TorchVAE(in_channels=3, out_channels=3, latent_channels=4, block_out_channels=(8, 16),
             down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
             up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"), layers_per_block=1,
             norm_num_groups=8, latents_mean=[0.0] * 4,
             latents_std=[1.0] * 4).save_pretrained(tmp_path / "vae")
    T5EncoderModel(T5Config(d_model=10, d_ff=24, num_layers=2, num_heads=2, d_kv=5,
                            vocab_size=384, feed_forward_proj="gated-gelu",
                            tie_word_embeddings=False)).save_pretrained(tmp_path / "text_encoder")
    TorchSched(use_dynamic_shifting=True, base_shift=0.25, max_shift=0.75,
               time_shift_type="linear").save_pretrained(tmp_path / "scheduler")

    index = {
        "_class_name": "GlmImagePipeline", "_diffusers_version": "0.40.0.dev0",
        "transformer": ["diffusers", "GlmImageTransformer2DModel"],
        "vae": ["diffusers", "AutoencoderKL"],
        "text_encoder": ["transformers", "T5EncoderModel"],
        "tokenizer": [None, None],
        "processor": [None, None],
        "vision_language_encoder": [None, None],
        "scheduler": ["diffusers", "FlowMatchEulerDiscreteScheduler"],
    }
    with open(os.path.join(tmp_path, "model_index.json"), "w") as f:
        json.dump(index, f)

    pipe = GlmImagePipeline.from_pretrained(str(tmp_path), tokenizer=DummyByT5Tok())
    rng = np.random.RandomState(0)
    vs = pipe.vae_scale_factor  # 2
    H = W = 8 * vs  # latent 8x8, token grid 4x4 -> 16 prior tokens
    prior = rng.randint(0, 32, (1, 16))

    # t2i with quoted glyph span
    out = pipe('a poster saying "HELLO"', height=H, width=W, num_inference_steps=2,
               guidance_scale=2.0, prior_token_ids=prior, key=jax.random.PRNGKey(0),
               output_type="np")
    img = np.asarray(out.images)
    assert img.shape[0] == 1 and np.isfinite(img).all()

    # i2i: condition image -> KV cache read (cond) / skip (uncond)
    cond_img = rng.uniform(-1, 1, (3, H, W)).astype(np.float32)
    cond_prior = rng.randint(0, 32, (16,))
    out2 = pipe("restyle 'this'", image=[cond_img], height=H, width=W,
                num_inference_steps=2, guidance_scale=2.0, prior_token_ids=prior,
                prior_token_image_ids=[cond_prior],
                source_image_grid_thw=[np.array([[1, 4, 4]])],
                key=jax.random.PRNGKey(1), output_type="latent")
    assert np.isfinite(np.asarray(out2.images)).all()
