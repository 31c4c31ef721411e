"""Stable Audio parity (DiT, Oobleck VAE, projection model) + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

DIT_KWARGS = dict(
    sample_size=8,
    in_channels=6,
    num_layers=2,
    attention_head_dim=8,
    num_attention_heads=4,
    num_key_value_attention_heads=2,
    out_channels=6,
    cross_attention_dim=16,
    time_proj_dim=8,
    global_states_input_dim=12,
    cross_attention_input_dim=10,
)

VAE_KWARGS = dict(
    encoder_hidden_size=8,
    downsampling_ratios=[2, 4],
    channel_multiples=[2, 4],
    decoder_channels=8,
    decoder_input_channels=4,
    audio_channels=2,
    sampling_rate=100,
)

PROJ_KWARGS = dict(text_encoder_dim=10, conditioning_dim=16, min_value=0, max_value=10)


def test_stable_audio_dit_parity():
    torch = pytest.importorskip("torch")
    from diffusers import StableAudioDiTModel as TorchModel

    from diffusers_tpu.models.transformers.stable_audio_transformer import StableAudioDiTModel

    tm = TorchModel(**DIT_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = StableAudioDiTModel(**DIT_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 8).astype(np.float32)
    ehs = rng.randn(2, 5, 10).astype(np.float32)
    ghs = rng.randn(2, 1, 12).astype(np.float32)
    t = np.array([3.0], dtype=np.float32)

    from diffusers.models.embeddings import get_1d_rotary_pos_embed

    rot = get_1d_rotary_pos_embed(4, 9, use_real=True, repeat_interleave_real=False)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ehs),
            global_hidden_states=torch.from_numpy(ghs),
            rotary_embedding=rot,
        ).sample.numpy()
    cos, sin = np.asarray(rot[0]), np.asarray(rot[1])
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t),
          encoder_hidden_states=jnp.asarray(ehs),
          global_hidden_states=jnp.asarray(ghs),
          rotary_embedding=(jnp.asarray(cos), jnp.asarray(sin))).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_autoencoder_oobleck_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderOobleck as TorchVAE

    from diffusers_tpu.models.autoencoders.autoencoder_oobleck import AutoencoderOobleck

    tm = TorchVAE(**VAE_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderOobleck(**VAE_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(1)
    x = rng.randn(1, 2, 64).astype(np.float32)
    with torch.no_grad():
        post = tm.encode(torch.from_numpy(x)).latent_dist
        ref_mean = post.mean.numpy()
        ref_std = post.std.numpy()
        ref_dec = tm.decode(torch.from_numpy(ref_mean)).sample.numpy()
    dist = m.encode(params, jnp.asarray(x)).latent_dist
    assert np.max(np.abs(np.asarray(dist.mean) - ref_mean)) < 5e-4, np.max(np.abs(np.asarray(dist.mean) - ref_mean))
    assert np.max(np.abs(np.asarray(dist.std) - ref_std)) < 5e-4
    dec = np.asarray(m.decode(params, jnp.asarray(ref_mean)).sample)
    assert dec.shape == ref_dec.shape
    assert np.max(np.abs(dec - ref_dec)) < 5e-4, np.max(np.abs(dec - ref_dec))


def test_projection_model_parity():
    torch = pytest.importorskip("torch")
    from diffusers.pipelines.stable_audio.modeling_stable_audio import (
        StableAudioProjectionModel as TorchProj,
    )

    from diffusers_tpu.pipelines.stable_audio.modeling_stable_audio import StableAudioProjectionModel

    tm = TorchProj(**PROJ_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = StableAudioProjectionModel(**PROJ_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(2)
    text = rng.randn(2, 5, 10).astype(np.float32)
    start = np.array([0.0, 2.0], dtype=np.float32)
    end = np.array([7.0, 10.0], dtype=np.float32)
    with torch.no_grad():
        ref = tm(
            text_hidden_states=torch.from_numpy(text),
            start_seconds=torch.from_numpy(start),
            end_seconds=torch.from_numpy(end),
        )
    out = m(params, text_hidden_states=jnp.asarray(text),
            start_seconds=jnp.asarray(start), end_seconds=jnp.asarray(end))
    for a, b in [
        (out.text_hidden_states, ref.text_hidden_states),
        (out.seconds_start_hidden_states, ref.seconds_start_hidden_states),
        (out.seconds_end_hidden_states, ref.seconds_end_hidden_states),
    ]:
        assert np.max(np.abs(np.asarray(a) - b.numpy())) < 5e-4


def test_stable_audio_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_oobleck import AutoencoderOobleck
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.models.transformers.stable_audio_transformer import StableAudioDiTModel
    from diffusers_tpu.pipelines.stable_audio import StableAudioPipeline, StableAudioProjectionModel
    from diffusers_tpu.schedulers.scheduling_edm_dpmsolver_multistep import (
        EDMDPMSolverMultistepScheduler,
    )

    key = jax.random.PRNGKey(0)
    vae = AutoencoderOobleck(**{**VAE_KWARGS, "decoder_input_channels": 6})
    te = T5EncoderModel(vocab_size=100, d_model=10, d_kv=4, d_ff=16, num_layers=2, num_heads=2)
    proj = StableAudioProjectionModel(**PROJ_KWARGS)
    transformer = StableAudioDiTModel(
        **{**DIT_KWARGS, "cross_attention_input_dim": 16, "global_states_input_dim": 32}
    )

    class Tok:
        model_max_length = 6

        def __call__(self, prompts, padding=None, max_length=6, truncation=True, return_tensors="np"):
            class Out:
                pass

            o = Out()
            ids, masks = [], []
            for p in prompts:
                n = len(p) % 3 + 2
                ids.append([((hash(p) + i) % 90) + 2 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = StableAudioPipeline(
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        projection_model=(proj, proj.init_params(key)),
        tokenizer=Tok(),
        transformer=(transformer, transformer.init_params(key)),
        scheduler=EDMDPMSolverMultistepScheduler(),
    )
    out = pipe("rain on a tin roof", audio_end_in_s=0.3, num_inference_steps=2,
               guidance_scale=4.0, key=key, output_type="np")
    assert out.audios.shape[0] == 1 and out.audios.shape[1] == 2
    assert np.isfinite(out.audios).all()
