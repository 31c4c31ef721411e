"""AnyFlowFARTransformer3DModel parity vs the torch reference: the chunk-
causal train rollout and the KV-cache prefill + autoregressive read paths."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_anyflow_far import (
    AnyFlowFARTransformer3DModel,
)

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=(1, 2, 2),
    compressed_patch_size=(1, 4, 4),
    full_chunk_limit=2,
    num_attention_heads=2,
    attention_head_dim=12,
    in_channels=4,
    out_channels=4,
    text_dim=16,
    freq_dim=32,
    ffn_dim=32,
    num_layers=2,
    cross_attn_norm=True,
    rope_max_seq_len=64,
    chunk_partition=(1, 2, 2),
)


def _models():
    torch = pytest.importorskip("torch")
    from diffusers import AnyFlowFARTransformer3DModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AnyFlowFARTransformer3DModel(**TINY)
    params = convert_torch_state_dict(m, sd)
    return torch, tm, m, params


def test_anyflow_far_train_path_parity():
    torch, tm, m, params = _models()
    rng = np.random.RandomState(0)
    # 3 chunks > full_chunk_limit=2 -> 1 compressed context chunk
    hs = rng.randn(1, 5, 4, 8, 8).astype(np.float32)
    t = np.full((1, 5), 500.0, dtype=np.float32)
    r = t * 0.5
    ehs = rng.randn(1, 7, 16).astype(np.float32)

    with torch.no_grad():
        ref = tm(
            hidden_states=torch.from_numpy(hs),
            timestep=torch.from_numpy(t),
            r_timestep=torch.from_numpy(r),
            encoder_hidden_states=torch.from_numpy(ehs),
            chunk_partition=list(TINY["chunk_partition"]),
        ).sample.numpy()

    out = np.asarray(
        m(params, jnp.asarray(hs), jnp.asarray(t), jnp.asarray(r), jnp.asarray(ehs),
          chunk_partition=list(TINY["chunk_partition"])).sample
    )
    assert out.shape == ref.shape, (out.shape, ref.shape)
    assert np.max(np.abs(out - ref)) < 2e-3, np.max(np.abs(out - ref))


def test_anyflow_far_kv_cache_paths_parity():
    torch, tm, m, params = _models()
    rng = np.random.RandomState(1)
    ehs = rng.randn(1, 7, 16).astype(np.float32)
    chunk0 = rng.randn(1, 1, 4, 8, 8).astype(np.float32)  # frames of chunk 0
    chunk1 = rng.randn(1, 2, 4, 8, 8).astype(np.float32)  # noisy chunk 1

    ftpf = (8 // 2) * (8 // 2)
    ctpf = (8 // 4) * (8 // 4)
    cp = [1, 2]

    # --- torch side: reference pipeline-style cache allocation
    tkv = {
        li: {
            "full_cache": torch.zeros((2, 1, 2, TINY["full_chunk_limit"] * max(cp) * ftpf, 12)),
            "compressed_cache": torch.zeros(
                (2, 1, 2, (len(cp) - TINY["full_chunk_limit"] + 1) * max(cp) * ctpf, 12)),
        }
        for li in range(TINY["num_layers"])
    }
    zeros_t = np.zeros((1, 1), dtype=np.float32)
    with torch.no_grad():
        _, tkv = tm(
            hidden_states=torch.from_numpy(chunk0),
            timestep=torch.from_numpy(zeros_t),
            r_timestep=torch.from_numpy(zeros_t),
            encoder_hidden_states=torch.from_numpy(ehs),
            chunk_partition=[1],
            kv_cache=[tkv[i] for i in range(TINY["num_layers"])],
            kv_cache_flag={"num_cached_chunks": 0, "is_cache_step": True},
            return_dict=False,
        )
        t1 = np.full((1, 2), 400.0, dtype=np.float32)
        ref, _ = tm(
            hidden_states=torch.from_numpy(chunk1),
            timestep=torch.from_numpy(t1),
            r_timestep=torch.from_numpy(t1 * 0.25),
            encoder_hidden_states=torch.from_numpy(ehs),
            chunk_partition=cp,
            kv_cache=tkv,
            kv_cache_flag={"num_cached_chunks": 1, "is_cache_step": False},
            return_dict=False,
        )
        ref = ref.numpy()

    # --- jax side: functional cache
    kv = m.init_kv_cache(1, 8, 8, cp)
    out = m(params, jnp.asarray(chunk0), jnp.asarray(zeros_t), jnp.asarray(zeros_t),
            jnp.asarray(ehs), chunk_partition=[1], kv_cache=kv,
            kv_cache_flag={"num_cached_chunks": 0, "is_cache_step": True})
    assert out.sample is None
    kv = out.kv_cache
    out = m(params, jnp.asarray(chunk1), jnp.asarray(t1), jnp.asarray(t1 * 0.25),
            jnp.asarray(ehs), chunk_partition=cp, kv_cache=kv,
            kv_cache_flag={"num_cached_chunks": 1, "is_cache_step": False})
    mine = np.asarray(out.sample)
    assert mine.shape == ref.shape, (mine.shape, ref.shape)
    assert np.max(np.abs(mine - ref)) < 2e-3, np.max(np.abs(mine - ref))


def test_anyflow_far_clean_context_train_path():
    _, _, m, _ = _models()
    params = m.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(2)
    hs = jnp.asarray(rng.randn(1, 5, 4, 8, 8).astype(np.float32))
    clean = jnp.asarray(rng.randn(1, 4, 4, 8, 8).astype(np.float32))  # num_full_frames=4
    t = jnp.full((1, 5), 300.0)
    ct = jnp.zeros((1, 4))
    ehs = jnp.asarray(rng.randn(1, 7, 16).astype(np.float32))
    out = m(params, hs, t, t * 0.5, ehs, chunk_partition=[1, 2, 2],
            clean_hidden_states=clean, clean_timestep=ct)
    assert np.asarray(out.sample).shape == (1, 4, 4, 8, 8)
    assert np.isfinite(np.asarray(out.sample)).all()


def test_anyflow_far_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
    from diffusers_tpu.models.text_encoders.t5 import UMT5EncoderModel
    from diffusers_tpu.pipelines.anyflow import AnyFlowFARPipeline
    from diffusers_tpu.schedulers import FlowMapEulerDiscreteScheduler
    from tests.test_anyflow import DummyTok

    key = jax.random.PRNGKey(0)
    transformer = AnyFlowFARTransformer3DModel(**{**TINY, "chunk_partition": (1, 1, 1)})
    vae = AutoencoderKLWan(
        base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1, attn_scales=[],
        temperal_downsample=[True, False], latents_mean=[0.0] * 4, latents_std=[1.0] * 4,
        scale_factor_temporal=2, scale_factor_spatial=2,
    )
    te = UMT5EncoderModel(vocab_size=64, d_model=16, d_kv=8, d_ff=32, num_layers=2, num_heads=2)
    pipe = AnyFlowFARPipeline(
        tokenizer=DummyTok(), text_encoder=(te, te.init_params(key)),
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)),
        scheduler=FlowMapEulerDiscreteScheduler(shift=5.0),
    )
    # 3 latent frames over 3 chunks with full_chunk_limit=2 -> the last
    # prefill demotes chunk 0 to the compressed branch
    out = pipe("a drone flyover", height=16, width=16, num_frames=5,
               num_inference_steps=2, guidance_scale=2.0, key=key,
               max_sequence_length=10, output_type="latent")
    frames = np.asarray(out.frames)
    assert frames.shape == (1, 3, 4, 8, 8)
    assert np.isfinite(frames).all()
