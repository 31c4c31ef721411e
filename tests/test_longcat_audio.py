"""LongCat-AudioDiT: transformer + VAE parity vs torch reference, pipeline smoke.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_longcat_audio_dit.py:455`,
`/root/reference/src/diffusers/models/autoencoders/autoencoder_longcat_audio_dit.py:296`,
`/root/reference/src/diffusers/pipelines/longcat_audio_dit/pipeline_longcat_audio_dit.py:99`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_longcat_audio_dit import LongCatAudioDiTVae
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_longcat_audio_dit import (
    LongCatAudioDiTTransformer,
)

sys.path.insert(0, "/root/reference/src")

TINY_DIT = dict(dit_dim=32, dit_depth=2, dit_heads=4, dit_text_dim=12, latent_dim=8)
TINY_VAE = dict(in_channels=1, channels=8, c_mults=[1, 2], strides=[2, 2], latent_dim=4,
                encoder_latent_dim=8, downsampling_ratio=4, sample_rate=16)


def _randomize_zero_params(tm, torch):
    with torch.no_grad():
        for n, p in tm.named_parameters():
            if (p == 0).all():
                p.data.normal_(0.0, 0.05)


@pytest.mark.refparity
@pytest.mark.parametrize("adaln_type", ["global", "local"])
def test_longcat_audio_transformer_parity(adaln_type):
    torch = pytest.importorskip("torch")
    from diffusers import LongCatAudioDiTTransformer as TorchModel

    tm = TorchModel(**TINY_DIT, adaln_type=adaln_type)
    tm.eval()
    _randomize_zero_params(tm, torch)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = LongCatAudioDiTTransformer(**TINY_DIT, adaln_type=adaln_type)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, T, S = 2, 10, 6
    x = rng.randn(B, T, 8).astype(np.float32)
    ehs = rng.randn(B, S, 12).astype(np.float32)
    emask = np.ones((B, S), dtype=bool)
    emask[0, 4:] = False
    amask = np.ones((B, T), dtype=bool)
    amask[1, 7:] = False
    t = np.array([0.3, 0.9], dtype=np.float32)
    lc = rng.randn(B, T, 8).astype(np.float32)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), encoder_hidden_states=torch.from_numpy(ehs),
            encoder_attention_mask=torch.from_numpy(emask), timestep=torch.from_numpy(t),
            attention_mask=torch.from_numpy(amask), latent_cond=torch.from_numpy(lc),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(emask), jnp.asarray(t),
          attention_mask=jnp.asarray(amask), latent_cond=jnp.asarray(lc)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3, np.max(np.abs(out - ref))


@pytest.mark.refparity
def test_longcat_audio_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import LongCatAudioDiTVae as TorchVae

    tm = TorchVae(**TINY_VAE)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = LongCatAudioDiTVae(**TINY_VAE)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(1)
    audio = rng.randn(2, 1, 32).astype(np.float32) * 0.2
    with torch.no_grad():
        ref_lat = tm.encode(torch.from_numpy(audio), sample_posterior=False).latents.numpy()
        ref_dec = tm.decode(torch.from_numpy(ref_lat)).sample.numpy()
    lat = np.asarray(m.encode(params, jnp.asarray(audio), sample_posterior=False).latents)
    dec = np.asarray(m.decode(params, jnp.asarray(lat)).sample)
    assert lat.shape == ref_lat.shape
    assert np.max(np.abs(lat - ref_lat)) < 1e-3, np.max(np.abs(lat - ref_lat))
    assert np.max(np.abs(dec - ref_dec)) < 1e-3, np.max(np.abs(dec - ref_dec))


class DummyTok:
    model_max_length = 32

    def __call__(self, text, padding=None, truncation=True, max_length=None, return_tensors="np"):
        if isinstance(text, str):
            text = [text]
        lens = [max(1, min(max_length or 16, 4 + len(t) % 6)) for t in text]
        width = max(lens)
        ids = np.zeros((len(text), width), dtype=np.int64)
        mask = np.zeros((len(text), width), dtype=np.int64)
        for i, (t, n) in enumerate(zip(text, lens)):
            ids[i, :n] = [(hash(t) + j) % 60 + 3 for j in range(n)]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


def test_longcat_audio_pipeline_smoke():
    from diffusers_tpu.models.text_encoders.t5 import UMT5EncoderModel
    from diffusers_tpu.pipelines.longcat_audio_dit import LongCatAudioDiTPipeline

    key = jax.random.PRNGKey(0)
    dit = LongCatAudioDiTTransformer(dit_dim=32, dit_depth=2, dit_heads=4,
                                     dit_text_dim=16, latent_dim=4)
    vae = LongCatAudioDiTVae(**TINY_VAE)
    te = UMT5EncoderModel(vocab_size=64, d_model=16, d_kv=8, d_ff=32, num_layers=2, num_heads=2)
    pipe = LongCatAudioDiTPipeline(
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=DummyTok(),
        transformer=(dit, dit.init_params(key)),
    )
    out = pipe("ocean waves", audio_duration_s=3.0, num_inference_steps=2,
               guidance_scale=2.0, key=key, output_type="np")
    audio = np.asarray(out.audios)
    # 3 s * 16 Hz / 4 = 12 latent frames -> 48 samples
    assert audio.shape == (1, 1, 48) and np.isfinite(audio).all()

    # duration heuristic path (no audio_duration_s)
    out = pipe("rain", num_inference_steps=1, guidance_scale=1.0, key=key, output_type="latent")
    assert np.isfinite(np.asarray(out.audios)).all()
