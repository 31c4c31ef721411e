"""QwenImage transformer parity vs the torch reference + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_qwenimage import QwenImageTransformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=2,
    in_channels=16,
    out_channels=4,
    num_layers=2,
    attention_head_dim=16,
    num_attention_heads=2,
    joint_attention_dim=24,
    axes_dims_rope=(8, 4, 4),
)


def test_qwenimage_parity():
    torch = pytest.importorskip("torch")
    from diffusers import QwenImageTransformer2DModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = QwenImageTransformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    img_seq = 16  # 4x4 latent grid
    x = rng.randn(2, img_seq, 16).astype(np.float32)
    ehs = rng.randn(2, 7, 24).astype(np.float32)
    mask = np.ones((2, 7), dtype=np.int64)
    mask[0, 5:] = 0
    t = np.array([0.5, 0.9], dtype=np.float32)
    img_shapes = [(1, 4, 4)]
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(ehs), torch.from_numpy(mask),
            torch.from_numpy(t), img_shapes=img_shapes,
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(mask), jnp.asarray(t),
          img_shapes=img_shapes).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_qwenimage_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.pipelines.qwenimage import QwenImagePipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import FlowMatchEulerDiscreteScheduler

    key = jax.random.PRNGKey(0)
    transformer = QwenImageTransformer2DModel(**TINY)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=16, scaling_factor=1.0,
    )

    class DummyQwen:
        def __call__(self, params, ids, attention_mask=None, output_hidden_states=False):
            class Out:
                pass

            o = Out()
            rng = np.random.RandomState(int(np.asarray(ids).sum()) % 991)
            hs = jnp.asarray(rng.randn(ids.shape[0], ids.shape[1], 24).astype(np.float32))
            o.hidden_states = [hs * 0.3, hs]
            o.last_hidden_state = hs
            return o

    class Tok:
        def __call__(self, prompts, padding=None, max_length=40, truncation=True, return_tensors="np"):
            class Out:
                pass

            o = Out()
            ids, masks = [], []
            for p in prompts:
                n = min(36, len(p) % 5 + 35)
                ids.append([((hash(p) + i) % 70) + 1 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = QwenImagePipeline(
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
        vae=(vae, vae.init_params(key)),
        text_encoder=(DummyQwen(), {}),
        tokenizer=Tok(),
        transformer=(transformer, transformer.init_params(key)),
    )
    # vae_scale_factor defaults to 8 for the 2D AutoencoderKL here
    out = pipe("a jade rabbit", height=32, width=32, num_inference_steps=2,
               true_cfg_scale=3.0, key=key, max_sequence_length=6, output_type="latent")
    assert np.isfinite(np.asarray(out.images)).all()
