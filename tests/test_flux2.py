"""Flux 2 transformer parity + pipeline smoke."""

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
    timestep_guidance_channels=16,
    mlp_ratio=2.0,
    axes_dims_rope=(2, 2, 2, 2),
    rope_theta=2000,
    guidance_embeds=True,
)


def test_flux2_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import Flux2Transformer2DModel as TorchModel

    from diffusers_tpu.models.transformers.transformer_flux2 import Flux2Transformer2DModel

    tm = TorchModel(**TF_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = Flux2Transformer2DModel(**TF_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    B, S_img, S_txt = 2, 16, 6
    x = rng.randn(B, S_img, 16).astype(np.float32)
    ehs = rng.randn(B, S_txt, 24).astype(np.float32)
    t = np.array([0.4, 0.9], dtype=np.float32)
    g = np.array([3.5, 3.5], dtype=np.float32)
    # 4-axis ids: image over (h, w), text over l
    hh, ww = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    img_ids = np.stack([np.zeros(16), hh.reshape(-1), ww.reshape(-1), np.zeros(16)], -1).astype(np.float32)
    txt_ids = np.zeros((S_txt, 4), dtype=np.float32)
    txt_ids[:, 3] = np.arange(S_txt)

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(ehs), torch.from_numpy(t),
            img_ids=torch.from_numpy(img_ids), txt_ids=torch.from_numpy(txt_ids),
            guidance=torch.from_numpy(g),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t),
          img_ids=jnp.asarray(img_ids), txt_ids=jnp.asarray(txt_ids),
          guidance=jnp.asarray(g)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_flux2_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.llama import LlamaModel
    from diffusers_tpu.models.transformers.transformer_flux2 import Flux2Transformer2DModel
    from diffusers_tpu.pipelines.flux2 import Flux2Pipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    transformer = Flux2Transformer2DModel(**TF_KWARGS)
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, block_out_channels=(32, 32),
        layers_per_block=1, latent_channels=4, norm_num_groups=32, scaling_factor=0.36,
    )
    # stand-in "Mistral" LLM: stacking layers (1, 2, 2) of hidden 8 → 24 = joint dim
    llm = LlamaModel(
        vocab_size=50, hidden_size=8, intermediate_size=16, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2,
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
                ids.append([((hash(p) + i) % 40) + 2 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = Flux2Pipeline(
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
        vae=(vae, vae.init_params(key)), text_encoder=(llm, llm.init_params(key)),
        tokenizer=Tok(), transformer=(transformer, transformer.init_params(key)),
    )
    out = pipe("a red fox in snow", height=16, width=16, num_inference_steps=2,
               guidance_scale=4.0, key=key, max_sequence_length=8,
               hidden_states_layers=(1, 2, 2), output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()
