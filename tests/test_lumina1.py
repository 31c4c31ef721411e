"""Lumina-Next (v1) transformer parity + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TF_KWARGS = dict(
    sample_size=8,
    patch_size=2,
    in_channels=4,
    hidden_size=32,
    num_layers=2,
    num_attention_heads=4,
    num_kv_heads=2,
    multiple_of=16,
    ffn_dim_multiplier=None,
    norm_eps=1e-5,
    learn_sigma=True,
    qk_norm=True,
    cross_attention_dim=24,
    scaling_factor=1.0,
)


def test_lumina_next_parity():
    torch = pytest.importorskip("torch")
    from diffusers import LuminaNextDiT2DModel as TorchModel
    from diffusers.models.embeddings import get_2d_rotary_pos_embed_lumina

    from diffusers_tpu.models.transformers.lumina_nextdit2d import (
        LuminaNextDiT2DModel,
        get_2d_rotary_pos_embed_lumina_np,
    )

    tm = TorchModel(**TF_KWARGS)
    torch.manual_seed(0)
    # pad_token is torch.empty garbage — seed everything deterministically
    for p in tm.parameters():
        if not p.data.isfinite().all() or p.data.abs().max() > 1e3:
            p.data.normal_(0.0, 0.02)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = LuminaNextDiT2DModel(**TF_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    ehs = rng.randn(2, 6, 24).astype(np.float32)
    mask = np.ones((2, 6), dtype=np.int64)
    mask[0, 4:] = 0
    t = np.array([0.3, 0.7], dtype=np.float32)

    head_dim = 32 // 4
    freqs_cis = get_2d_rotary_pos_embed_lumina(head_dim, 6, 6)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ehs),
            torch.from_numpy(mask), freqs_cis,
            cross_attention_kwargs={"base_sequence_length": 16},
        ).sample.numpy()

    cos, sin = get_2d_rotary_pos_embed_lumina_np(head_dim, 6, 6)
    # cross-check our table against the reference complex table
    np.testing.assert_allclose(np.real(np.asarray(freqs_cis)), cos, atol=1e-5)
    np.testing.assert_allclose(np.imag(np.asarray(freqs_cis)), sin, atol=1e-5)

    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs), jnp.asarray(mask),
          (jnp.asarray(cos), jnp.asarray(sin)), base_sequence_length=16).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_lumina_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.gemma import Gemma2Model
    from diffusers_tpu.models.transformers.lumina_nextdit2d import LuminaNextDiT2DModel
    from diffusers_tpu.pipelines.lumina import LuminaPipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    transformer = LuminaNextDiT2DModel(**TF_KWARGS)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, block_out_channels=(32, 32),
        layers_per_block=1, latent_channels=4, norm_num_groups=32, scaling_factor=0.13,
    )
    te = Gemma2Model(
        vocab_size=64, hidden_size=24, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, head_dim=12,
    )

    class Tok:
        model_max_length = 8

        def __call__(self, prompts, padding=None, max_length=8, truncation=True, return_tensors="np"):
            class Out:
                pass

            o = Out()
            ids, masks = [], []
            for p in prompts:
                n = len(p) % 3 + 2
                ids.append([((hash(p) + i) % 50) + 2 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = LuminaPipeline(
        transformer=(transformer, transformer.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(),
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)), tokenizer=Tok(),
    )
    out = pipe("a glass sculpture", height=16, width=16, num_inference_steps=2,
               guidance_scale=4.0, key=key, proportional_attn=False, output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()
