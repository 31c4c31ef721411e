"""ACE-Step 1.5: DiT + condition-encoder parity vs torch reference, FSQ
tokenizer roundtrip, pipeline smoke.

Reference: `/root/reference/src/diffusers/models/transformers/ace_step_transformer.py:432`,
`/root/reference/src/diffusers/pipelines/ace_step/modeling_ace_step.py:752`,
`/root/reference/src/diffusers/pipelines/ace_step/pipeline_ace_step.py:786`.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_ace_step import AceStepTransformer1DModel

sys.path.insert(0, "/root/reference/src")

TINY_DIT = dict(
    hidden_size=32,
    intermediate_size=48,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=8,
    in_channels=24,  # acoustic(8) + context(8 + 8 mask)
    audio_acoustic_hidden_dim=8,
    patch_size=2,
    sliding_window=4,
)

TINY_COND = dict(
    hidden_size=32,
    intermediate_size=48,
    text_hidden_dim=16,
    timbre_hidden_dim=8,
    num_lyric_encoder_hidden_layers=2,
    num_timbre_encoder_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=8,
    sliding_window=4,
)


@pytest.mark.refparity
def test_ace_step_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AceStepTransformer1DModel as TorchModel

    tm = TorchModel(**TINY_DIT)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AceStepTransformer1DModel(**TINY_DIT)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, T, S_enc = 2, 11, 7  # odd T exercises patch padding
    x = rng.randn(B, T, 8).astype(np.float32)
    ctx = rng.randn(B, T, 16).astype(np.float32)
    ehs = rng.randn(B, S_enc, 32).astype(np.float32)
    t = np.array([0.7, 0.2], dtype=np.float32)
    tr = np.array([0.7, 0.2], dtype=np.float32)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), timestep=torch.from_numpy(t),
            timestep_r=torch.from_numpy(tr), encoder_hidden_states=torch.from_numpy(ehs),
            context_latents=torch.from_numpy(ctx),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(tr), jnp.asarray(ehs),
          jnp.asarray(ctx)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3, np.max(np.abs(out - ref))


@pytest.mark.refparity
def test_ace_step_condition_encoder_parity():
    torch = pytest.importorskip("torch")
    from diffusers.pipelines.ace_step.modeling_ace_step import (
        AceStepConditionEncoder as TorchCE,
    )

    from diffusers_tpu.pipelines.ace_step import AceStepConditionEncoder

    tm = TorchCE(**TINY_COND)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AceStepConditionEncoder(**TINY_COND)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(1)
    B, S_txt, S_lyr, T_ref = 2, 5, 9, 12
    text = rng.randn(B, S_txt, 16).astype(np.float32)
    text_mask = np.ones((B, S_txt), dtype=bool)
    text_mask[0, 3:] = False
    lyric = rng.randn(B, S_lyr, 16).astype(np.float32)
    lyric_mask = np.ones((B, S_lyr), dtype=bool)
    lyric_mask[1, 6:] = False
    refer = rng.randn(B, T_ref, 8).astype(np.float32)
    order = np.arange(B, dtype=np.int64)

    with torch.no_grad():
        ref_h, ref_m = tm(
            text_hidden_states=torch.from_numpy(text),
            text_attention_mask=torch.from_numpy(text_mask),
            lyric_hidden_states=torch.from_numpy(lyric),
            lyric_attention_mask=torch.from_numpy(lyric_mask),
            refer_audio_acoustic_hidden_states_packed=torch.from_numpy(refer),
            refer_audio_order_mask=torch.from_numpy(order),
        )
    out_h, out_m = m(
        params, jnp.asarray(text), jnp.asarray(text_mask), jnp.asarray(lyric),
        jnp.asarray(lyric_mask), jnp.asarray(refer), order,
    )
    assert np.array_equal(np.asarray(out_m), ref_m.numpy())
    assert np.max(np.abs(np.asarray(out_h) - ref_h.numpy())) < 1e-3


@pytest.mark.refparity
def test_ace_step_fsq_tokenizer_parity():
    torch = pytest.importorskip("torch")
    from diffusers.pipelines.ace_step.modeling_ace_step import (
        AceStepAudioTokenizer as TorchTok,
    )

    from diffusers_tpu.pipelines.ace_step import AceStepAudioTokenizer

    cfg = dict(
        hidden_size=32, intermediate_size=48, audio_acoustic_hidden_dim=8,
        pool_window_size=5, fsq_dim=32, num_attention_pooler_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8, sliding_window=4,
    )
    tm = TorchTok(**cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AceStepAudioTokenizer(**cfg)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(2)
    x = rng.randn(1, 13, 8).astype(np.float32)  # non-multiple of 5 → padding path
    with torch.no_grad():
        ref_q, ref_idx = tm.tokenize(torch.from_numpy(x))
    out_q, out_idx = m.tokenize(params, jnp.asarray(x))
    assert np.array_equal(np.asarray(out_idx), ref_idx.numpy())
    assert np.max(np.abs(np.asarray(out_q) - ref_q.numpy())) < 1e-3

    # indices → output roundtrip used by audio_codes conditioning
    with torch.no_grad():
        ref_out = tm.quantizer.get_output_from_indices(ref_idx)
    out = m.quantizer.get_output_from_indices(params["quantizer"], out_idx)
    assert np.max(np.abs(np.asarray(out) - ref_out.numpy())) < 1e-3


class DummyTok:
    pad_token_id = 0

    def __call__(self, text, padding=None, truncation=True, max_length=None, return_tensors="np"):
        if isinstance(text, str):
            text = [text]
        lens = [min(max_length or 24, 8 + len(t) % 7) for t in text]
        width = max(lens)
        ids = np.zeros((len(text), width), dtype=np.int64)
        mask = np.zeros((len(text), width), dtype=np.int64)
        for i, (t, n) in enumerate(zip(text, lens)):
            ids[i, :n] = [(hash(t) + j) % 90 + 3 for j in range(n)]
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


def _tiny_pipe(is_turbo=True):
    from diffusers_tpu.models.autoencoders.autoencoder_oobleck import AutoencoderOobleck
    from diffusers_tpu.models.text_encoders.llama import LlamaModel
    from diffusers_tpu.pipelines.ace_step import (
        AceStepAudioTokenDetokenizer,
        AceStepAudioTokenizer,
        AceStepConditionEncoder,
        AceStepPipeline,
    )
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    dit = AceStepTransformer1DModel(**TINY_DIT, is_turbo=is_turbo)
    ce = AceStepConditionEncoder(**TINY_COND)
    te = LlamaModel(vocab_size=128, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                    num_attention_heads=2, num_key_value_heads=1, head_dim=8, qk_norm=True)
    vae = AutoencoderOobleck(
        encoder_hidden_size=16, downsampling_ratios=[2, 4], channel_multiples=[1, 2],
        decoder_channels=8, decoder_input_channels=8, audio_channels=2, sampling_rate=8,
    )
    tok_cfg = dict(hidden_size=32, intermediate_size=48, audio_acoustic_hidden_dim=8,
                   pool_window_size=5, fsq_dim=32, num_attention_pooler_hidden_layers=1,
                   num_attention_heads=4, num_key_value_heads=2, head_dim=8, sliding_window=4)
    atok = AceStepAudioTokenizer(**tok_cfg)
    adetok = AceStepAudioTokenDetokenizer(**{k: v for k, v in tok_cfg.items() if k != "fsq_dim"})
    ce_params = ce.init_params(key)
    ce_params["silence_latent"] = jax.random.normal(key, ce_params["silence_latent"].shape) * 0.1
    return AceStepPipeline(
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=DummyTok(),
        transformer=(dit, dit.init_params(key)),
        condition_encoder=(ce, ce_params),
        scheduler=FlowMatchEulerDiscreteScheduler(num_train_timesteps=1, shift=1.0),
        audio_tokenizer=(atok, atok.init_params(key)),
        audio_token_detokenizer=(adetok, adetok.init_params(key)),
    )


def test_ace_step_pipeline_smoke_turbo():
    pipe = _tiny_pipe(is_turbo=True)
    out = pipe("upbeat synthwave", lyrics="[verse]\nhello", audio_duration=16.0,
               num_inference_steps=2, key=jax.random.PRNGKey(0), output_type="np")
    audio = np.asarray(out.audios)
    assert audio.shape[0] == 1 and audio.shape[1] == 2 and np.isfinite(audio).all()
    # −1 dBFS peak normalization
    assert abs(float(np.max(np.abs(audio))) - 10 ** (-1 / 20)) < 1e-3


def test_ace_step_pipeline_smoke_cfg_and_repaint():
    pipe = _tiny_pipe(is_turbo=False)
    out = pipe("piano ballad", lyrics="", audio_duration=16.0, num_inference_steps=3,
               guidance_scale=3.0, key=jax.random.PRNGKey(1), output_type="latent")
    assert np.isfinite(np.asarray(out.audios)).all()

    # repaint with src audio (2 channels, sample_rate=8 → 16s = 128 samples)
    src = np.random.RandomState(0).randn(2, 128).astype(np.float32) * 0.1
    out = pipe("piano ballad", lyrics="", task_type="repaint", src_audio=src,
               repainting_start=4.0, repainting_end=10.0, num_inference_steps=2,
               guidance_scale=1.0, key=jax.random.PRNGKey(2), output_type="latent")
    assert np.isfinite(np.asarray(out.audios)).all()


def test_ace_step_pipeline_audio_codes_cover():
    pipe = _tiny_pipe(is_turbo=True)
    codes = "".join(f"<|audio_code_{i}|>" for i in [3, 99, 12000])
    out = pipe("vocal cover", lyrics="la la", audio_codes=codes, audio_duration=-1,
               num_inference_steps=2, audio_cover_strength=0.5,
               key=jax.random.PRNGKey(3), output_type="latent")
    lat = np.asarray(out.audios)
    # 3 codes × pool_window 5 = 15 latent frames
    assert lat.shape[1] == 15 and np.isfinite(lat).all()
