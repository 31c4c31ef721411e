"""Latte transformer parity vs the torch reference + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.latte_transformer_3d import LatteTransformer3DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    num_attention_heads=2,
    attention_head_dim=8,
    in_channels=4,
    out_channels=8,
    num_layers=2,
    cross_attention_dim=16,
    sample_size=8,
    patch_size=2,
    norm_type="ada_norm_single",
    caption_channels=12,
    video_length=3,
)


def test_latte_parity():
    torch = pytest.importorskip("torch")
    from diffusers import LatteTransformer3DModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = LatteTransformer3DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 3, 8, 8).astype(np.float32)
    ehs = rng.randn(2, 6, 12).astype(np.float32)
    # the reference pipeline never passes a mask (embeds pre-masked upstream)
    t = np.array([500, 100], dtype=np.int64)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ehs),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_latte_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.pipelines.latte import LattePipeline
    from diffusers_tpu.schedulers.scheduling_ddim import DDIMScheduler

    key = jax.random.PRNGKey(0)
    transformer = LatteTransformer3DModel(**{**TINY, "out_channels": 8})
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=16,
    )
    te = T5EncoderModel(vocab_size=128, d_model=12, d_kv=8, d_ff=24, num_layers=2, num_heads=2)

    class Tok:
        model_max_length = 6

        def __call__(self, prompts, padding=None, max_length=6, truncation=True, return_tensors="np"):
            class Out:
                pass

            o = Out()
            ids, masks = [], []
            for p in prompts:
                n = len(p) % 3 + 2
                ids.append([((hash(p) + i) % 100) + 2 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = LattePipeline(
        tokenizer=Tok(),
        text_encoder=(te, te.init_params(key)),
        vae=(vae, vae.init_params(key)),
        transformer=(transformer, transformer.init_params(key)),
        scheduler=DDIMScheduler(),
    )
    # learn-sigma style out_channels=8: scheduler sees the epsilon half only if
    # the model config out == 2*in; Latte reference predicts 8 channels and the
    # pipeline splits — here out=8 and in=4, so split epsilon half
    out = pipe("a paper crane unfolding", height=8, width=8, video_length=3,
               num_inference_steps=2, guidance_scale=6.0, key=key, max_sequence_length=6,
               output_type="latent")
    assert np.isfinite(np.asarray(out.frames)).all()
