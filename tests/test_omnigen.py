"""OmniGen transformer parity (with multimodal image splicing) + pipeline
smoke (t2i and image-conditioned)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TF_KWARGS = dict(
    in_channels=4,
    patch_size=2,
    hidden_size=32,
    rms_norm_eps=1e-5,
    num_attention_heads=4,
    num_key_value_heads=4,
    intermediate_size=48,
    num_layers=2,
    pad_token_id=2,
    vocab_size=60,
    max_position_embeddings=1024,
    original_max_position_embeddings=512,
    rope_base=10000,
    rope_scaling={"short_factor": [1.0, 1.1, 1.2, 0.9], "long_factor": [1.0, 1.0, 1.0, 1.0]},
    pos_embed_max_size=16,
)


def test_omnigen_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import OmniGenTransformer2DModel as TorchModel

    from diffusers_tpu.models.transformers.transformer_omnigen import OmniGenTransformer2DModel

    tm = TorchModel(**TF_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = OmniGenTransformer2DModel(**TF_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, S_text = 2, 10
    x = rng.randn(B, 4, 8, 8).astype(np.float32)
    input_ids = rng.randint(3, 60, size=(B, S_text))
    # splice a 2x2-latent input image (1 patch-token span) into sample 0
    img_latent = rng.randn(1, 4, 4, 4).astype(np.float32)  # 2x2=4 tokens
    input_image_sizes = {0: [[3, 7]]}
    input_ids[0, 3:7] = 0
    S = S_text + 1 + 16  # text + time token + 4x4 image patches
    mask = np.ones((B, S, S), dtype=np.int64)
    mask[1, :, :2] = 0  # padded prefix on sample 1
    pos = np.tile(np.arange(S)[None], (B, 1))
    t = np.array([0.4, 0.8], dtype=np.float32)

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(input_ids),
            [torch.from_numpy(img_latent)], input_image_sizes,
            torch.from_numpy(mask), torch.from_numpy(pos),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(input_ids),
          [jnp.asarray(img_latent)], input_image_sizes,
          jnp.asarray(mask), jnp.asarray(pos)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


class Tok:
    def __call__(self, text):
        class Out:
            pass

        o = Out()
        o.input_ids = [1] + [((hash(c) % 50) + 3) for c in text[:12]]
        return o


def _pipe(key):
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.transformers.transformer_omnigen import OmniGenTransformer2DModel
    from diffusers_tpu.pipelines.omnigen import OmniGenPipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    transformer = OmniGenTransformer2DModel(**TF_KWARGS)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, block_out_channels=(32, 32),
        layers_per_block=1, latent_channels=4, norm_num_groups=32, scaling_factor=0.13,
    )
    return OmniGenPipeline(
        transformer=(transformer, transformer.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(),
        vae=(vae, vae.init_params(key)), tokenizer=Tok(),
    )


def test_omnigen_pipeline_smoke_t2i():
    key = jax.random.PRNGKey(0)
    pipe = _pipe(key)
    out = pipe("a tiny house", height=16, width=16, num_inference_steps=2,
               guidance_scale=2.5, key=key, output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()


def test_omnigen_pipeline_smoke_img_cond():
    key = jax.random.PRNGKey(1)
    pipe = _pipe(key)
    ref_img = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    out = pipe("edit <img><|image_1|></img> to be blue", input_images=[ref_img],
               height=16, width=16, num_inference_steps=2, guidance_scale=2.5,
               img_guidance_scale=1.6, key=key, output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()
