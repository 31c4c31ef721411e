"""Mochi transformer + VAE parity vs the torch reference, and pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.autoencoders.autoencoder_kl_mochi import AutoencoderKLMochi
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_mochi import MochiTransformer3DModel

sys.path.insert(0, "/root/reference/src")

TF_TINY = dict(
    patch_size=2,
    num_attention_heads=2,
    attention_head_dim=16,
    num_layers=2,
    pooled_projection_dim=16,
    in_channels=4,
    text_embed_dim=32,
    time_embed_dim=8,
    activation_fn="swiglu",
    max_sequence_length=16,
)

VAE_TINY = dict(
    in_channels=15,
    out_channels=3,
    encoder_block_out_channels=(32, 32),
    decoder_block_out_channels=(32, 32),
    latent_channels=4,
    layers_per_block=(1, 1, 1),
    act_fn="silu",
    temporal_expansions=(2,),
    spatial_expansions=(2,),
    add_attention_block=(False, True, True),
    latents_mean=tuple(np.zeros(4).tolist()),
    latents_std=tuple(np.ones(4).tolist()),
    scaling_factor=1.0,
)


def test_mochi_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import MochiTransformer3DModel as TorchModel

    tm = TorchModel(**TF_TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = MochiTransformer3DModel(**TF_TINY)
    params = convert_torch_state_dict(m, sd)
    # pos_frequencies initializes to zeros; perturb for a meaningful RoPE check
    rng = np.random.RandomState(7)
    pf = rng.randn(*np.asarray(params["pos_frequencies"]).shape).astype(np.float32) * 0.02
    params["pos_frequencies"] = jnp.asarray(pf)
    with torch.no_grad():
        tm.pos_frequencies.copy_(torch.from_numpy(pf))

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 3, 8, 8).astype(np.float32)
    ehs = rng.randn(2, 16, 32).astype(np.float32)
    mask = np.ones((2, 16), dtype=np.int64)
    mask[:, 10:] = 0  # prefix-contiguous padding
    t = np.array([999, 500], dtype=np.int64)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(ehs), torch.from_numpy(t),
            torch.from_numpy(mask).bool(),
        ).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t), jnp.asarray(mask)).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_mochi_vae_parity():
    torch = pytest.importorskip("torch")
    from diffusers import AutoencoderKLMochi as TorchVAE

    tm = TorchVAE(**VAE_TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = AutoencoderKLMochi(**VAE_TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(1)
    x = rng.randn(1, 3, 5, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_moments = tm.encode(torch.from_numpy(x)).latent_dist.parameters.numpy()
    moments = np.asarray(m.encode(params, jnp.asarray(x)).parameters)
    assert moments.shape == ref_moments.shape
    assert np.max(np.abs(moments - ref_moments)) < 5e-4, np.max(np.abs(moments - ref_moments))

    z = rng.randn(1, 4, 3, 4, 4).astype(np.float32)
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(z)).sample.numpy()
    dec = np.asarray(m.decode(params, jnp.asarray(z)).sample)
    assert dec.shape == ref_dec.shape
    assert np.max(np.abs(dec - ref_dec)) < 5e-4, np.max(np.abs(dec - ref_dec))


def get_dummy_pipeline():
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.pipelines.mochi import MochiPipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import FlowMatchEulerDiscreteScheduler

    key = jax.random.PRNGKey(0)
    transformer = MochiTransformer3DModel(**TF_TINY)
    vae = AutoencoderKLMochi(**VAE_TINY)
    te = T5EncoderModel(vocab_size=256, d_model=32, d_ff=64, num_layers=2, num_heads=2, d_kv=16)

    class Tok:
        model_max_length = 16

        def __call__(self, prompts, padding=None, max_length=16, truncation=True, return_tensors="np"):
            class Out:
                pass

            out = Out()
            ids, masks = [], []
            for p in prompts:
                n = min(len(p) % 5 + 3, max_length)
                row = [((hash(p) + i) % 200) + 2 for i in range(n)]
                ids.append(row + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            out.input_ids = np.array(ids)
            out.attention_mask = np.array(masks)
            return out

    sched = FlowMatchEulerDiscreteScheduler()
    return MochiPipeline(
        scheduler=sched,
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=Tok(),
        transformer=(transformer, transformer.init_params(key)),
    )


def test_mochi_pipeline_smoke():
    key = jax.random.PRNGKey(0)
    pipe = get_dummy_pipeline()
    out = pipe("a capy... a dog swimming", height=16, width=16, num_frames=3,
               num_inference_steps=2, guidance_scale=4.0, key=key, output_type="np")
    assert out.frames.shape[0] == 1 and out.frames.shape[-1] == 3
    assert np.isfinite(out.frames).all()
