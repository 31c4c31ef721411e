"""CogView3-Plus transformer parity + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TF_KWARGS = dict(
    patch_size=2,
    in_channels=4,
    num_layers=2,
    attention_head_dim=8,
    num_attention_heads=4,
    out_channels=4,
    text_embed_dim=24,
    time_embed_dim=16,
    condition_dim=8,
    pos_embed_max_size=16,
    sample_size=8,
)


def test_cogview3plus_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import CogView3PlusTransformer2DModel as TorchModel

    from diffusers_tpu.models.transformers.transformer_cogview3plus import (
        CogView3PlusTransformer2DModel,
    )

    tm = TorchModel(**TF_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = CogView3PlusTransformer2DModel(**TF_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    ehs = rng.randn(2, 5, 24).astype(np.float32)
    t = np.array([3, 9], dtype=np.int64)
    osz = np.array([[16.0, 16.0]] * 2, dtype=np.float32)
    tsz = np.array([[16.0, 16.0]] * 2, dtype=np.float32)
    cc = np.array([[0.0, 0.0]] * 2, dtype=np.float32)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(ehs), torch.from_numpy(t),
            original_size=torch.from_numpy(osz), target_size=torch.from_numpy(tsz),
            crop_coords=torch.from_numpy(cc),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t),
          original_size=jnp.asarray(osz), target_size=jnp.asarray(tsz),
          crop_coords=jnp.asarray(cc)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_cogview3plus_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.models.transformers.transformer_cogview3plus import (
        CogView3PlusTransformer2DModel,
    )
    from diffusers_tpu.pipelines.cogview3 import CogView3PlusPipeline
    from diffusers_tpu.schedulers.scheduling_ddim import DDIMScheduler

    key = jax.random.PRNGKey(0)
    transformer = CogView3PlusTransformer2DModel(**TF_KWARGS)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, block_out_channels=(32, 32),
        layers_per_block=1, latent_channels=4, norm_num_groups=32, scaling_factor=0.2,
    )
    te = T5EncoderModel(vocab_size=60, d_model=24, d_kv=8, d_ff=32, num_layers=2, num_heads=2)

    class Tok:
        model_max_length = 8

        def __call__(self, prompts, padding=None, max_length=8, truncation=True,
                     return_tensors="np", add_special_tokens=True):
            class Out:
                pass

            o = Out()
            ids = []
            for p in prompts:
                n = len(p) % 3 + 2
                ids.append([((hash(p) + i) % 50) + 2 for i in range(n)] + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = (o.input_ids != 0).astype(np.int64)
            return o

    pipe = CogView3PlusPipeline(
        tokenizer=Tok(), text_encoder=(te, te.init_params(key)),
        vae=(vae, vae.init_params(key)), transformer=(transformer, transformer.init_params(key)),
        scheduler=DDIMScheduler(),
    )
    out = pipe("a red barn", height=16, width=16, num_inference_steps=2,
               guidance_scale=5.0, key=key, max_sequence_length=8, output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()
