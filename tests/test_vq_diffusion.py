"""VQ-Diffusion: vectorized Transformer2DModel parity + pipeline e2e.

Reference: models/transformers/transformer_2d.py:212 (_init_vectorized_inputs),
pipelines/deprecated/vq_diffusion/pipeline_vq_diffusion.py:52.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_2d import Transformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    num_attention_heads=2,
    attention_head_dim=8,
    num_layers=2,
    num_vector_embeds=17,  # 16 codes + mask
    sample_size=4,
    num_embeds_ada_norm=10,
    cross_attention_dim=12,
    norm_type="ada_norm",
)


def test_vectorized_transformer2d_parity():
    torch = pytest.importorskip("torch")
    from diffusers.models.transformers.transformer_2d import Transformer2DModel as TorchT2D

    torch.manual_seed(0)
    tm = TorchT2D(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = Transformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 17, size=(2, 16)).astype(np.int64)
    ctx = rng.randn(2, 5, 12).astype(np.float32)
    t = np.array(3, np.int64)

    with torch.no_grad():
        ref = tm(torch.from_numpy(ids), encoder_hidden_states=torch.from_numpy(ctx),
                 timestep=torch.tensor(3)).sample.numpy()
    ours = np.asarray(m(params, jnp.asarray(ids), encoder_hidden_states=jnp.asarray(ctx),
                        timestep=jnp.asarray(t)))
    assert ours.shape == ref.shape == (2, 16, 16)
    err = np.max(np.abs(ours - ref))
    assert err < 5e-4, f"vectorized transformer diverges: {err}"


def get_dummy_pipeline(learnable_cf=True):
    from diffusers_tpu.models.autoencoders.vq_model import VQModel
    from diffusers_tpu.models.text_encoders.clip import CLIPTextModel
    from diffusers_tpu.pipelines.deprecated.vq_diffusion import (
        LearnedClassifierFreeSamplingEmbeddings,
        VQDiffusionPipeline,
    )
    from diffusers_tpu.schedulers.scheduling_vq_diffusion import VQDiffusionScheduler

    from tests.test_pipeline_sdxl import DummyTokenizer

    key = jax.random.PRNGKey(0)
    transformer = Transformer2DModel(**TINY)
    vqvae = VQModel(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=8, num_vq_embeddings=16, norm_num_groups=4, layers_per_block=1,
    )
    te = CLIPTextModel(
        vocab_size=1000, hidden_size=12, intermediate_size=24, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=77, projection_dim=12,
    )
    lcfse = LearnedClassifierFreeSamplingEmbeddings(
        learnable=learnable_cf, hidden_size=12, length=77,
    )
    scheduler = VQDiffusionScheduler(num_vec_classes=17, num_train_timesteps=10)
    return VQDiffusionPipeline(
        vqvae=(vqvae, vqvae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=DummyTokenizer(),
        transformer=(transformer, transformer.init_params(key)),
        learned_classifier_free_sampling_embeddings=(lcfse, lcfse.init_params(key)),
        scheduler=scheduler,
    )


def test_vq_diffusion_pipeline():
    pipe = get_dummy_pipeline()
    out = pipe("a vector-quantized cat", num_inference_steps=3, guidance_scale=5.0,
               truncation_rate=0.9, key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 4, 4, 3)
    assert np.isfinite(out.images).all()


def test_vq_diffusion_pipeline_tokenized_uncond():
    pipe = get_dummy_pipeline(learnable_cf=False)
    out = pipe("x", num_inference_steps=2, guidance_scale=2.0,
               key=jax.random.PRNGKey(1), output_type="np")
    assert out.images.shape == (1, 4, 4, 3)
