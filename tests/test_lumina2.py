"""Lumina2 transformer parity vs the torch reference + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_lumina2 import Lumina2Transformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    sample_size=16,
    patch_size=2,
    in_channels=4,
    hidden_size=32,
    num_layers=2,
    num_refiner_layers=1,
    num_attention_heads=2,
    num_kv_heads=1,
    multiple_of=16,
    ffn_dim_multiplier=None,
    norm_eps=1e-5,
    scaling_factor=1.0,
    axes_dim_rope=(8, 4, 4),
    axes_lens=(32, 32, 32),
    cap_feat_dim=16,
)


def test_lumina2_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import Lumina2Transformer2DModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = Lumina2Transformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    ehs = rng.randn(2, 6, 16).astype(np.float32)
    mask = np.ones((2, 6), dtype=np.int64)
    mask[0, 4:] = 0
    mask[1, 5:] = 0
    t = np.array([0.3, 0.8], dtype=np.float32)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ehs),
            torch.from_numpy(mask).bool(),
        ).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs), jnp.asarray(mask)).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_lumina2_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.gemma import Gemma2Model
    from diffusers_tpu.pipelines.lumina2 import Lumina2Pipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import FlowMatchEulerDiscreteScheduler

    key = jax.random.PRNGKey(0)
    transformer = Lumina2Transformer2DModel(**TINY)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=16,
    )
    te = Gemma2Model(vocab_size=256, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                     num_attention_heads=2, num_key_value_heads=1, head_dim=8, sliding_window=64)

    class Tok:
        model_max_length = 8

        def __call__(self, prompts, padding=None, max_length=8, truncation=True, return_tensors="np"):
            class Out:
                pass

            out = Out()
            ids, masks = [], []
            for p in prompts:
                n = len(p) % 4 + 2
                ids.append([((hash(p) + i) % 200) + 2 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            out.input_ids = np.array(ids)
            out.attention_mask = np.array(masks)
            return out

    pipe = Lumina2Pipeline(
        transformer=(transformer, transformer.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)),
        tokenizer=Tok(),
    )
    out = pipe("a lantern festival", height=16, width=16, num_inference_steps=2,
               guidance_scale=4.0, cfg_trunc_ratio=0.5, key=key, output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()
