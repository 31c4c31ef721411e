"""Helios: transformer (multi-term history memory, batched pooled rope,
guidance cross-attn, history key amplify) + staged UniPC/Euler scheduler
parity vs the torch reference, and a from_pretrained chunked generate.

Reference: `/root/reference/src/diffusers/models/transformers/transformer_helios.py:501`,
`/root/reference/src/diffusers/schedulers/scheduling_helios.py:35`,
`/root/reference/src/diffusers/schedulers/scheduling_helios_dmd.py:35`,
`/root/reference/src/diffusers/pipelines/helios/pipeline_helios.py:108`.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_helios import HeliosTransformer3DModel
from diffusers_tpu.schedulers.scheduling_helios import HeliosScheduler
from diffusers_tpu.schedulers.scheduling_helios_dmd import HeliosDMDScheduler

sys.path.insert(0, "/root/reference/src")

TF_TINY = dict(
    patch_size=(1, 2, 2),
    num_attention_heads=2,
    attention_head_dim=12,
    in_channels=4,
    out_channels=4,
    text_dim=16,
    freq_dim=32,
    ffn_dim=48,
    num_layers=2,
    cross_attn_norm=True,
    rope_dim=(4, 4, 4),
    guidance_cross_attn=True,
    zero_history_timestep=True,
    has_multi_term_memory_patch=True,
    is_amplify_history=True,
    history_scale_mode="per_head",
)


def _history_inputs(rng, B=1, C=4, lh=8, lw=8):
    """FramePack-style history windows + fixed indices like the pipeline."""
    history_sizes = [4, 2, 1]
    chunk = 3
    bounds = np.cumsum([1, *history_sizes, chunk])
    all_idx = np.arange(bounds[-1])
    idx_prefix, idx_long, idx_mid, idx_1x, idx_cur = np.split(all_idx, bounds[:-1])
    idx_short = np.concatenate([idx_prefix, idx_1x])
    x = rng.randn(B, C, chunk, lh, lw).astype(np.float32)
    h_short = rng.randn(B, C, len(idx_short), lh, lw).astype(np.float32)
    h_mid = rng.randn(B, C, len(idx_mid), lh, lw).astype(np.float32)
    h_long = rng.randn(B, C, len(idx_long), lh, lw).astype(np.float32)
    return (x, h_short, h_mid, h_long,
            idx_cur[None], idx_short[None], idx_mid[None], idx_long[None])


@pytest.mark.refparity
def test_helios_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import HeliosTransformer3DModel as TorchModel

    tm = TorchModel(**TF_TINY)
    tm.eval()
    # history_key_scale inits at ones; randomize so the amplify path is exercised
    with torch.no_grad():
        for blk in tm.blocks:
            blk.attn1.history_key_scale.uniform_(-1.0, 1.0)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = HeliosTransformer3DModel(**TF_TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x, hs, hm, hl, ic, is_, im, il = _history_inputs(rng)
    ehs = rng.randn(1, 6, 16).astype(np.float32)
    t = np.array([500.0], dtype=np.float32)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(x), timestep=torch.from_numpy(t),
            encoder_hidden_states=torch.from_numpy(ehs),
            indices_hidden_states=torch.from_numpy(ic),
            indices_latents_history_short=torch.from_numpy(is_),
            indices_latents_history_mid=torch.from_numpy(im),
            indices_latents_history_long=torch.from_numpy(il),
            latents_history_short=torch.from_numpy(hs),
            latents_history_mid=torch.from_numpy(hm),
            latents_history_long=torch.from_numpy(hl),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs),
          indices_hidden_states=jnp.asarray(ic),
          indices_latents_history_short=jnp.asarray(is_),
          indices_latents_history_mid=jnp.asarray(im),
          indices_latents_history_long=jnp.asarray(il),
          latents_history_short=jnp.asarray(hs),
          latents_history_mid=jnp.asarray(hm),
          latents_history_long=jnp.asarray(hl)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


@pytest.mark.refparity
def test_helios_transformer_no_history_parity():
    torch = pytest.importorskip("torch")
    from diffusers import HeliosTransformer3DModel as TorchModel

    cfg = dict(TF_TINY, guidance_cross_attn=False, is_amplify_history=False,
               has_multi_term_memory_patch=False)
    tm = TorchModel(**cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = HeliosTransformer3DModel(**cfg)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 3, 8, 8).astype(np.float32)
    ehs = rng.randn(2, 6, 16).astype(np.float32)
    t = np.array([100.0, 800.0], dtype=np.float32)
    with torch.no_grad():
        ref = tm(hidden_states=torch.from_numpy(x), timestep=torch.from_numpy(t),
                 encoder_hidden_states=torch.from_numpy(ehs)).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs)).sample)
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


@pytest.mark.refparity
@pytest.mark.parametrize("scheduler_type", ["unipc", "euler"])
def test_helios_scheduler_parity(scheduler_type):
    torch = pytest.importorskip("torch")
    from diffusers import HeliosScheduler as TorchSched

    cfg = dict(stages=1, shift=3.0, scheduler_type=scheduler_type,
               use_dynamic_shifting=False)
    ref_s = TorchSched(**cfg)
    ours = HeliosScheduler(**cfg)
    n = 6
    sigmas = np.linspace(0.999, 0.0, n + 1)[:-1]
    ref_s.set_timesteps(n, sigmas=sigmas)
    state = ours.set_timesteps(n, sigmas=sigmas, sample_shape=(1, 4, 2, 4, 4))

    np.testing.assert_allclose(np.asarray(state.timesteps), ref_s.timesteps.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.sigmas), ref_s.sigmas.numpy(), rtol=1e-5, atol=1e-7)

    rng = np.random.RandomState(0)
    sample_ref = torch.from_numpy(rng.randn(1, 4, 2, 4, 4).astype(np.float32))
    sample = jnp.asarray(sample_ref.numpy())
    for i, t in enumerate(ref_s.timesteps):
        pred = rng.randn(1, 4, 2, 4, 4).astype(np.float32)
        sample_ref = ref_s.step(torch.from_numpy(pred), t, sample_ref).prev_sample
        out = ours.step(state, jnp.asarray(pred), state.timesteps[i], sample)
        sample, state = out.prev_sample, out.state
    np.testing.assert_allclose(np.asarray(sample), sample_ref.numpy(), rtol=2e-4, atol=2e-4)


@pytest.mark.refparity
def test_helios_scheduler_staged_tables():
    torch = pytest.importorskip("torch")
    from diffusers import HeliosScheduler as TorchSched

    cfg = dict(stages=3, shift=1.0, scheduler_type="unipc")
    ref_s = TorchSched(**cfg)
    ours = HeliosScheduler(**cfg)
    for i_s in range(3):
        assert abs(ours.start_sigmas[i_s] - ref_s.start_sigmas[i_s]) < 1e-9
        assert abs(ours.end_sigmas[i_s] - ref_s.end_sigmas[i_s]) < 1e-9
        ref_s.set_timesteps(4, stage_index=i_s)
        state = ours.set_timesteps(4, stage_index=i_s)
        np.testing.assert_allclose(np.asarray(state.timesteps), ref_s.timesteps.numpy(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(state.sigmas), ref_s.sigmas.numpy(), rtol=1e-5, atol=1e-7)


@pytest.mark.refparity
def test_helios_dmd_scheduler_parity():
    torch = pytest.importorskip("torch")
    from diffusers import HeliosDMDScheduler as TorchSched

    cfg = dict(stages=1, shift=2.0, time_shift_type="linear")
    ref_s = TorchSched(**cfg)
    ours = HeliosDMDScheduler(**cfg)
    ref_s.set_timesteps(3)
    state = ours.set_timesteps(3)
    np.testing.assert_allclose(np.asarray(state.timesteps), ref_s.timesteps.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.sigmas), ref_s.sigmas.numpy(), rtol=1e-5, atol=1e-7)

    rng = np.random.RandomState(0)
    sample = rng.randn(1, 4, 2, 4, 4).astype(np.float32)
    noise = rng.randn(1, 4, 2, 4, 4).astype(np.float32)
    all_ts = ref_s.timesteps
    s_ref = torch.from_numpy(sample)
    s_ours = jnp.asarray(sample)
    for i, t in enumerate(all_ts):
        pred = rng.randn(1, 4, 2, 4, 4).astype(np.float32)
        s_ref = ref_s.step(
            torch.from_numpy(pred), t, s_ref, cur_sampling_step=i,
            dmd_noisy_tensor=torch.from_numpy(noise),
            dmd_sigmas=ref_s.sigmas, dmd_timesteps=ref_s.timesteps,
            all_timesteps=all_ts).prev_sample
        out = ours.step(state, jnp.asarray(pred), state.timesteps[i], s_ours,
                        dmd_noisy_tensor=jnp.asarray(noise))
        s_ours, state = out.prev_sample, out.state
    np.testing.assert_allclose(np.asarray(s_ours), s_ref.numpy(), rtol=2e-4, atol=2e-4)


@pytest.mark.refparity
def test_helios_from_pretrained_generate(tmp_path):
    torch = pytest.importorskip("torch")
    from diffusers import (
        AutoencoderKLWan as TorchVAE,
        HeliosScheduler as TorchSched,
        HeliosTransformer3DModel as TorchTf,
    )
    from transformers import T5Config, T5EncoderModel

    from diffusers_tpu.pipelines.helios import HeliosPipeline

    class DummyT5Tok:
        def __call__(self, prompts, max_length=16, **kw):
            ids, masks = [], []
            for p in prompts:
                n = 5
                ids.append([((hash(p) + i * 31) % 400) + 2 for i in range(n)] + [1] + [0] * (max_length - n - 1))
                masks.append([1] * (n + 1) + [0] * (max_length - n - 1))
            return {"input_ids": np.array(ids), "attention_mask": np.array(masks)}

    WAN_VAE_TINY = dict(
        base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1, attn_scales=[],
        temperal_downsample=[False, True], latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
    )

    torch.manual_seed(0)
    cfg = dict(TF_TINY, num_layers=1, text_dim=10, in_channels=WAN_VAE_TINY["z_dim"],
               out_channels=WAN_VAE_TINY["z_dim"])
    TorchTf(**cfg).save_pretrained(tmp_path / "transformer")
    TorchVAE(**WAN_VAE_TINY).save_pretrained(tmp_path / "vae")
    T5EncoderModel(T5Config(d_model=10, d_ff=24, num_layers=2, num_heads=2, d_kv=5,
                            vocab_size=384, feed_forward_proj="gated-gelu",
                            tie_word_embeddings=False)).save_pretrained(tmp_path / "text_encoder")
    TorchSched(stages=1, shift=3.0, scheduler_type="unipc").save_pretrained(tmp_path / "scheduler")

    index = {
        "_class_name": "HeliosPipeline", "_diffusers_version": "0.40.0.dev0",
        "transformer": ["diffusers", "HeliosTransformer3DModel"],
        "vae": ["diffusers", "AutoencoderKLWan"],
        "text_encoder": ["transformers", "T5EncoderModel"],
        "tokenizer": [None, None],
        "scheduler": ["diffusers", "HeliosScheduler"],
    }
    with open(os.path.join(tmp_path, "model_index.json"), "w") as f:
        json.dump(index, f)

    pipe = HeliosPipeline.from_pretrained(str(tmp_path), tokenizer=DummyT5Tok())
    sf = pipe.vae_scale_factor_spatial
    tf_ = pipe.vae_scale_factor_temporal
    # two chunks of 2 latent frames each
    out = pipe("a drone flying over a canyon", negative_prompt="static",
               height=8 * sf, width=8 * sf, num_frames=2 * (1 * tf_ + 1) + 1,
               num_inference_steps=2, guidance_scale=2.0,
               num_latent_frames_per_chunk=2, history_sizes=[2, 2, 1],
               key=jax.random.PRNGKey(0), max_sequence_length=12, output_type="np")
    video = np.asarray(out.frames)
    assert video.ndim == 5 and video.shape[0] == 1
    assert np.isfinite(video).all()


def _tiny_pyramid_components(key):
    """In-memory tiny components for the pyramid pipeline."""
    from diffusers_tpu.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel

    cfg = dict(TF_TINY, num_layers=1, text_dim=16,
               in_channels=4, out_channels=4)
    transformer = HeliosTransformer3DModel(**cfg)
    vae = AutoencoderKLWan(
        base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1, attn_scales=[],
        temperal_downsample=[False, True], latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
        scale_factor_temporal=2, scale_factor_spatial=2)
    t5 = T5EncoderModel(vocab_size=512, d_model=16, d_kv=8, d_ff=32, num_layers=1,
                        num_heads=2, feed_forward_proj="gated-gelu")

    class Tok:
        def __call__(self, prompts, max_length=16, **kw):
            ids, masks = [], []
            for p in prompts:
                n = 5
                ids.append([((hash(p) + i * 31) % 400) + 2 for i in range(n)] + [1] + [0] * (max_length - n - 1))
                masks.append([1] * (n + 1) + [0] * (max_length - n - 1))
            return {"input_ids": np.array(ids), "attention_mask": np.array(masks)}

    return (Tok(), (t5, t5.init_params(key)), (vae, vae.init_params(key)),
            (transformer, transformer.init_params(key)))


def test_helios_pyramid_generate():
    from diffusers_tpu.pipelines.helios import HeliosPyramidPipeline

    key = jax.random.PRNGKey(0)
    tok, te, vae, tf_ = _tiny_pyramid_components(key)
    scheduler = HeliosScheduler(stages=3, shift=1.0, scheduler_type="unipc",
                                use_dynamic_shifting=True)
    pipe = HeliosPyramidPipeline(tokenizer=tok, text_encoder=te, vae=vae,
                                 scheduler=scheduler, transformer=tf_,
                                 is_cfg_zero_star=True)
    out = pipe("a river delta seen from above", negative_prompt="blurry",
               height=16, width=16, num_frames=4, guidance_scale=3.0,
               num_latent_frames_per_chunk=2, history_sizes=[2, 2, 1],
               pyramid_num_inference_steps_list=[2, 2, 2],
               key=jax.random.PRNGKey(0), max_sequence_length=12, output_type="np")
    video = np.asarray(out.frames)
    assert video.ndim == 5 and np.isfinite(video).all()


def test_helios_pyramid_distilled_dmd_generate():
    from diffusers_tpu.pipelines.helios import HeliosPyramidPipeline

    key = jax.random.PRNGKey(1)
    tok, te, vae, tf_ = _tiny_pyramid_components(key)
    scheduler = HeliosDMDScheduler(stages=3, shift=1.0, use_dynamic_shifting=True,
                                   time_shift_type="linear")
    pipe = HeliosPyramidPipeline(tokenizer=tok, text_encoder=te, vae=vae,
                                 scheduler=scheduler, transformer=tf_,
                                 is_distilled=True)
    out = pipe("a campfire at night", height=16, width=16, num_frames=4,
               guidance_scale=1.0, num_latent_frames_per_chunk=2,
               history_sizes=[2, 2, 1], pyramid_num_inference_steps_list=[1, 1, 1],
               key=jax.random.PRNGKey(0), max_sequence_length=12, output_type="np")
    video = np.asarray(out.frames)
    assert video.ndim == 5 and np.isfinite(video).all()
