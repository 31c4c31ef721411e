"""Chroma transformer parity vs the torch reference + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_chroma import ChromaTransformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=1,
    in_channels=4,
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=8,
    num_attention_heads=2,
    joint_attention_dim=24,
    axes_dims_rope=(4, 2, 2),
    approximator_num_channels=16,
    approximator_hidden_dim=32,
    approximator_layers=2,
)


def test_chroma_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import ChromaTransformer2DModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = ChromaTransformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    img_seq, txt_seq = 16, 6
    x = rng.randn(2, img_seq, 4).astype(np.float32)
    ehs = rng.randn(2, txt_seq, 24).astype(np.float32)
    t = np.array([0.4, 0.9], dtype=np.float32)
    img_ids = np.zeros((img_seq, 3), dtype=np.float32)
    img_ids[:, 1] = np.repeat(np.arange(4), 4)
    img_ids[:, 2] = np.tile(np.arange(4), 4)
    txt_ids = np.zeros((txt_seq, 3), dtype=np.float32)
    mask = np.ones((2, txt_seq), dtype=np.float32)
    mask[0, 4:] = 0.0
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(ehs), torch.from_numpy(t),
            torch.from_numpy(img_ids), torch.from_numpy(txt_ids),
            attention_mask=torch.from_numpy(np.concatenate([mask, np.ones((2, img_seq), np.float32)], axis=1)),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t),
          jnp.asarray(img_ids), jnp.asarray(txt_ids), attention_mask=jnp.asarray(mask)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_chroma_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.pipelines.chroma import ChromaPipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import FlowMatchEulerDiscreteScheduler

    key = jax.random.PRNGKey(0)
    transformer = ChromaTransformer2DModel(**{**TINY, "in_channels": 16})
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=16,
        scaling_factor=1.0, shift_factor=0.0,
    )
    te = T5EncoderModel(vocab_size=128, d_model=24, d_kv=8, d_ff=32, num_layers=2, num_heads=2)

    class Tok:
        model_max_length = 8

        def __call__(self, prompts, padding=None, max_length=8, truncation=True, return_tensors="np"):
            class Out:
                pass

            out = Out()
            ids, masks = [], []
            for p in prompts:
                n = len(p) % 4 + 2
                ids.append([((hash(p) + i) % 100) + 2 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            out.input_ids = np.array(ids)
            out.attention_mask = np.array(masks)
            return out

    pipe = ChromaPipeline(
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=Tok(),
        transformer=(transformer, transformer.init_params(key)),
    )
    out = pipe("neon koi pond", height=8, width=8, num_inference_steps=2,
               guidance_scale=4.0, key=key, output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()
