"""Bria transformer parity + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TF_KWARGS = dict(
    patch_size=1,
    in_channels=16,
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=8,
    num_attention_heads=4,
    joint_attention_dim=24,
    guidance_embeds=False,
    axes_dims_rope=[2, 4, 2],
    rope_theta=10000,
    time_theta=10000,
)


def test_bria_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import BriaTransformer2DModel as TorchModel

    from diffusers_tpu.models.transformers.transformer_bria import BriaTransformer2DModel

    tm = TorchModel(**TF_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = BriaTransformer2DModel(**TF_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, S_img, S_txt = 2, 16, 6
    x = rng.randn(B, S_img, 16).astype(np.float32)
    ehs = rng.randn(B, S_txt, 24).astype(np.float32)
    t = np.array([100, 700], dtype=np.float32)
    hh, ww = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    img_ids = np.stack([np.zeros(16), hh.reshape(-1), ww.reshape(-1)], -1).astype(np.float32)
    txt_ids = np.zeros((S_txt, 3), dtype=np.float32)

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(ehs), timestep=torch.from_numpy(t),
            img_ids=torch.from_numpy(img_ids), txt_ids=torch.from_numpy(txt_ids),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), timestep=jnp.asarray(t),
          img_ids=jnp.asarray(img_ids), txt_ids=jnp.asarray(txt_ids)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_bria_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.models.transformers.transformer_bria import BriaTransformer2DModel
    from diffusers_tpu.pipelines.bria import BriaPipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    transformer = BriaTransformer2DModel(**TF_KWARGS)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, block_out_channels=(32, 32),
        layers_per_block=1, latent_channels=4, norm_num_groups=32, scaling_factor=0.3,
    )
    te = T5EncoderModel(vocab_size=60, d_model=24, d_kv=8, d_ff=32, num_layers=2, num_heads=2)

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

    pipe = BriaPipeline(
        transformer=(transformer, transformer.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(),
        vae=(vae, vae.init_params(key)),
        text_encoder=(te, te.init_params(key)), tokenizer=Tok(),
    )
    out = pipe("a lighthouse at dusk", height=16, width=16, num_inference_steps=2,
               guidance_scale=5.0, key=key, max_sequence_length=8, output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()
