"""AudioLDM2: projection model, double-cross-attention UNet, CLAP text tower,
GPT-2 continuous language model and HiFi-GAN vocoder parity vs torch, plus a
reference-layout from_pretrained -> generate.

Reference: `/root/reference/src/diffusers/pipelines/audioldm2/modeling_audioldm2.py`,
`/root/reference/src/diffusers/pipelines/audioldm2/pipeline_audioldm2.py:149`.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

UNET_TINY = dict(
    sample_size=16,
    in_channels=4,
    out_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    block_out_channels=(16, 32),
    layers_per_block=1,
    norm_num_groups=8,
    cross_attention_dim=([None, 12, 10], [None, 12, 10]),
    attention_head_dim=4,
)


@pytest.mark.refparity
def test_audioldm2_projection_model_parity():
    torch = pytest.importorskip("torch")
    from diffusers.pipelines.audioldm2 import AudioLDM2ProjectionModel as TorchProj

    from diffusers_tpu.pipelines.audioldm2 import AudioLDM2ProjectionModel

    cfg = dict(text_encoder_dim=6, text_encoder_1_dim=10, langauge_model_dim=12)
    tm = TorchProj(**cfg)
    tm.eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.5, 0.5)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AudioLDM2ProjectionModel(**cfg)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    h0 = rng.randn(2, 1, 6).astype(np.float32)
    h1 = rng.randn(2, 5, 10).astype(np.float32)
    m0 = np.ones((2, 1), np.int64)
    m1 = np.ones((2, 5), np.int64)
    m1[1, 3:] = 0
    with torch.no_grad():
        ref = tm(torch.from_numpy(h0), torch.from_numpy(h1),
                 torch.from_numpy(m0), torch.from_numpy(m1))
    out = m(params, jnp.asarray(h0), jnp.asarray(h1), jnp.asarray(m0), jnp.asarray(m1))
    np.testing.assert_allclose(np.asarray(out.hidden_states), ref.hidden_states.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.attention_mask), ref.attention_mask.numpy())


@pytest.mark.refparity
def test_audioldm2_unet_parity():
    torch = pytest.importorskip("torch")
    from diffusers.pipelines.audioldm2 import AudioLDM2UNet2DConditionModel as TorchUNet

    from diffusers_tpu.pipelines.audioldm2 import AudioLDM2UNet2DConditionModel

    tm = TorchUNet(**UNET_TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AudioLDM2UNet2DConditionModel(**UNET_TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 16, 8).astype(np.float32)
    gen = rng.randn(2, 8, 12).astype(np.float32)  # GPT-2 stream (idx<=1)
    t5 = rng.randn(2, 5, 10).astype(np.float32)  # T5 stream (idx>1)
    t5_mask = np.ones((2, 5), np.int64)
    t5_mask[0, 3:] = 0
    t = np.array([4, 30], dtype=np.int64)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(gen),
                 encoder_hidden_states_1=torch.from_numpy(t5),
                 encoder_attention_mask_1=torch.from_numpy(t5_mask)).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(gen),
                       encoder_hidden_states_1=jnp.asarray(t5),
                       encoder_attention_mask_1=jnp.asarray(t5_mask)).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


@pytest.mark.refparity
def test_clap_text_features_parity():
    torch = pytest.importorskip("torch")
    from transformers import ClapTextConfig, ClapTextModelWithProjection as TorchClap

    from diffusers_tpu.models.text_encoders.clap import ClapTextModelWithProjection

    cfg = dict(vocab_size=120, hidden_size=16, num_hidden_layers=2, num_attention_heads=2,
               intermediate_size=32, max_position_embeddings=64, type_vocab_size=1,
               pad_token_id=1, projection_dim=6)
    tm = TorchClap(ClapTextConfig(**cfg))
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = ClapTextModelWithProjection(**cfg)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    ids = rng.randint(2, 120, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    ids[1, 6:] = 1  # pad token
    with torch.no_grad():
        out_t = tm(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
        ref = torch.nn.functional.normalize(out_t.text_embeds, dim=-1).numpy()
    feats = np.asarray(m.get_text_features(params, jnp.asarray(ids), attention_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(feats, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.refparity
def test_gpt2_model_parity():
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2Model as TorchGPT2

    from diffusers_tpu.models.text_encoders.gpt2 import GPT2Model

    cfg = dict(vocab_size=100, n_positions=64, n_embd=12, n_layer=2, n_head=2)
    tm = TorchGPT2(GPT2Config(**cfg))
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = GPT2Model(**cfg)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    embeds = rng.randn(2, 7, 12).astype(np.float32)
    mask = np.ones((2, 7), np.int64)
    mask[1, 5:] = 0
    with torch.no_grad():
        ref = tm(inputs_embeds=torch.from_numpy(embeds),
                 attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    out = np.asarray(m(params, inputs_embeds=jnp.asarray(embeds),
                       attention_mask=jnp.asarray(mask)).last_hidden_state)
    # padded positions differ (torch position_ids vs mask handling) — compare valid
    valid = mask.astype(bool)
    assert np.max(np.abs(out[valid] - ref[valid])) < 2e-3


@pytest.mark.refparity
def test_speecht5_hifigan_parity():
    torch = pytest.importorskip("torch")
    from transformers import SpeechT5HifiGan as TorchVocoder, SpeechT5HifiGanConfig

    from diffusers_tpu.pipelines.audioldm2.vocoder import SpeechT5HifiGan

    cfg = dict(model_in_dim=8, sampling_rate=100, upsample_initial_channel=16,
               upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4],
               resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
               leaky_relu_slope=0.1, normalize_before=True)
    tm = TorchVocoder(SpeechT5HifiGanConfig(**cfg))
    tm.eval()
    with torch.no_grad():
        tm.mean.uniform_(-0.1, 0.1)
        tm.scale.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = SpeechT5HifiGan(**cfg)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    spec = rng.randn(2, 12, 8).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(spec)).numpy()
    out = np.asarray(m(params, jnp.asarray(spec)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


class DummyClapTok:
    model_max_length = 16

    def __call__(self, text, max_length=16, **kw):
        if isinstance(text, str):
            text = [text]
        ids = np.full((len(text), max_length), 1, np.int64)
        mask = np.zeros((len(text), max_length), np.int64)
        for i, p in enumerate(text):
            n = 6
            ids[i, :n] = [(hash(p) + j) % 100 + 2 for j in range(n)]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


class DummyT5Tok:
    model_max_length = 12

    def __call__(self, text, max_length=12, padding=True, **kw):
        if isinstance(text, str):
            text = [text]
        L = max_length if padding == "max_length" else 8
        ids = np.zeros((len(text), L), np.int64)
        mask = np.zeros((len(text), L), np.int64)
        for i, p in enumerate(text):
            n = 5
            ids[i, :n] = [(hash(p) + j) % 300 + 2 for j in range(n)]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


@pytest.mark.refparity
def test_audioldm2_from_pretrained_generate(tmp_path):
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKL as TorchVAE, DDIMScheduler as TorchSched
    from diffusers.pipelines.audioldm2 import (
        AudioLDM2ProjectionModel as TorchProj,
        AudioLDM2UNet2DConditionModel as TorchUNet,
    )
    from transformers import (
        ClapTextConfig,
        ClapTextModelWithProjection as TorchClap,
        GPT2Config,
        GPT2Model as TorchGPT2,
        SpeechT5HifiGan as TorchVocoder,
        SpeechT5HifiGanConfig,
        T5Config,
        T5EncoderModel,
    )

    from diffusers_tpu.pipelines.audioldm2 import AudioLDM2Pipeline

    torch.manual_seed(0)
    TorchUNet(**UNET_TINY).save_pretrained(tmp_path / "unet")
    TorchVAE(in_channels=1, out_channels=1, latent_channels=4, block_out_channels=(8, 16),
             down_block_types=("DownEncoderBlock2D", "DownEncoderBlock2D"),
             up_block_types=("UpDecoderBlock2D", "UpDecoderBlock2D"),
             layers_per_block=1, norm_num_groups=8,
             scaling_factor=0.9).save_pretrained(tmp_path / "vae")
    TorchClap(ClapTextConfig(vocab_size=120, hidden_size=16, num_hidden_layers=2,
                             num_attention_heads=2, intermediate_size=32,
                             max_position_embeddings=64, type_vocab_size=1, pad_token_id=1,
                             projection_dim=6)).save_pretrained(tmp_path / "text_encoder")
    T5EncoderModel(T5Config(d_model=10, d_ff=24, num_layers=2, num_heads=2, d_kv=5,
                            vocab_size=384, feed_forward_proj="gated-gelu",
                            tie_word_embeddings=False)).save_pretrained(tmp_path / "text_encoder_2")
    TorchProj(text_encoder_dim=6, text_encoder_1_dim=10,
              langauge_model_dim=12).save_pretrained(tmp_path / "projection_model")
    gpt2 = TorchGPT2(GPT2Config(vocab_size=100, n_positions=64, n_embd=12, n_layer=2, n_head=2))
    gpt2.config.max_new_tokens = 8
    gpt2.save_pretrained(tmp_path / "language_model")
    TorchVocoder(SpeechT5HifiGanConfig(
        model_in_dim=8, sampling_rate=100, upsample_initial_channel=16,
        upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4], resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]], normalize_before=True)).save_pretrained(tmp_path / "vocoder")
    TorchSched().save_pretrained(tmp_path / "scheduler")

    index = {
        "_class_name": "AudioLDM2Pipeline", "_diffusers_version": "0.40.0.dev0",
        "unet": ["diffusers", "AudioLDM2UNet2DConditionModel"],
        "vae": ["diffusers", "AutoencoderKL"],
        "text_encoder": ["transformers", "ClapTextModelWithProjection"],
        "text_encoder_2": ["transformers", "T5EncoderModel"],
        "projection_model": ["diffusers", "AudioLDM2ProjectionModel"],
        "language_model": ["transformers", "GPT2Model"],
        "tokenizer": [None, None],
        "tokenizer_2": [None, None],
        "feature_extractor": [None, None],
        "vocoder": ["transformers", "SpeechT5HifiGan"],
        "scheduler": ["diffusers", "DDIMScheduler"],
    }
    with open(os.path.join(tmp_path, "model_index.json"), "w") as f:
        json.dump(index, f)

    pipe = AudioLDM2Pipeline.from_pretrained(
        str(tmp_path), tokenizer=DummyClapTok(), tokenizer_2=DummyT5Tok(),
        feature_extractor=None)
    out = pipe("soft rain on a tin roof", negative_prompt="noise",
               audio_length_in_s=0.64, num_inference_steps=2, guidance_scale=2.0,
               key=jax.random.PRNGKey(0), output_type="np")
    audio = np.asarray(out.audios)
    assert audio.ndim == 2 and audio.shape[0] == 1
    assert np.isfinite(audio).all()
