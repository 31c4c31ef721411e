"""CogView4 transformer parity vs the torch reference + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_cogview4 import CogView4Transformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=2,
    in_channels=4,
    out_channels=4,
    num_layers=2,
    attention_head_dim=8,
    num_attention_heads=2,
    text_embed_dim=24,
    time_embed_dim=16,
    condition_dim=8,
    sample_size=8,
    rope_axes_dim=(16, 16),
)


def test_cogview4_parity():
    torch = pytest.importorskip("torch")
    from diffusers import CogView4Transformer2DModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = CogView4Transformer2DModel(**TINY)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    ehs = rng.randn(2, 5, 24).astype(np.float32)
    t = np.array([500, 100], dtype=np.float32)
    osz = np.array([[64, 64]] * 2, dtype=np.float32)
    tsz = np.array([[64, 64]] * 2, dtype=np.float32)
    crop = np.array([[0, 0]] * 2, dtype=np.float32)
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(ehs), torch.from_numpy(t),
            original_size=torch.from_numpy(osz), target_size=torch.from_numpy(tsz),
            crop_coords=torch.from_numpy(crop),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t),
          original_size=jnp.asarray(osz), target_size=jnp.asarray(tsz),
          crop_coords=jnp.asarray(crop)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_cogview4_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.pipelines.cogview4 import CogView4Pipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import FlowMatchEulerDiscreteScheduler

    key = jax.random.PRNGKey(0)
    transformer = CogView4Transformer2DModel(**TINY)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, block_out_channels=(8,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=4, sample_size=16,
    )

    class DummyGLM:
        def __call__(self, params, ids, attention_mask=None, output_hidden_states=False):
            class Out:
                pass

            o = Out()
            rng = np.random.RandomState(int(np.asarray(ids).sum()) % 997)
            hs = jnp.asarray(rng.randn(ids.shape[0], ids.shape[1], 24).astype(np.float32))
            o.hidden_states = [hs, hs * 0.5, hs * 0.1]
            o.last_hidden_state = hs
            return o

    class Tok:
        def __call__(self, prompts, padding=None, max_length=8, truncation=True, return_tensors="np"):
            class Out:
                pass

            o = Out()
            ids, masks = [], []
            for p in prompts:
                n = len(p) % 3 + 2
                ids.append([((hash(p) + i) % 60) + 1 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = CogView4Pipeline(
        tokenizer=Tok(),
        text_encoder=(DummyGLM(), {}),
        vae=(vae, vae.init_params(key)),
        transformer=(transformer, transformer.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True, time_shift_type="linear"),
    )
    out = pipe("bronze pavilion in rain", height=16, width=16, num_inference_steps=2,
               guidance_scale=5.0, key=key, output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()
