"""Wan-VACE transformer parity + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TF_KWARGS = dict(
    patch_size=(1, 2, 2),
    num_attention_heads=2,
    attention_head_dim=8,
    in_channels=4,
    out_channels=4,
    text_dim=20,
    freq_dim=16,
    ffn_dim=32,
    num_layers=2,
    cross_attn_norm=True,
    qk_norm="rms_norm_across_heads",
    eps=1e-6,
    rope_max_seq_len=64,
    vace_layers=[0, 1],
    vace_in_channels=6,
)


def test_wan_vace_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import WanVACETransformer3DModel as TorchModel

    from diffusers_tpu.models.transformers.transformer_wan_vace import WanVACETransformer3DModel

    tm = TorchModel(**TF_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = WanVACETransformer3DModel(**TF_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 2, 8, 8).astype(np.float32)
    ctrl = rng.randn(2, 6, 2, 8, 8).astype(np.float32)
    ehs = rng.randn(2, 5, 20).astype(np.float32)
    scale = np.array([0.8, 1.2], dtype=np.float32)
    t = np.array([3, 9], dtype=np.int64)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(ehs),
                 control_hidden_states=torch.from_numpy(ctrl),
                 control_hidden_states_scale=torch.from_numpy(scale)).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ehs),
          control_hidden_states=jnp.asarray(ctrl),
          control_hidden_states_scale=jnp.asarray(scale)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_wan_vace_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
    from diffusers_tpu.models.text_encoders.t5 import UMT5EncoderModel
    from diffusers_tpu.models.transformers.transformer_wan_vace import WanVACETransformer3DModel
    from diffusers_tpu.pipelines.wan import WanVACEPipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    vae = AutoencoderKLWan(
        base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1,
        attn_scales=[], temperal_downsample=[False, True], dropout=0.0,
    )
    tf_kwargs = {**TF_KWARGS, "vace_in_channels": 4 * 2 + 4}  # 2*z_dim + spatial_factor^2
    transformer = WanVACETransformer3DModel(**tf_kwargs)
    te = UMT5EncoderModel(vocab_size=60, d_model=20, d_kv=8, d_ff=32, num_layers=2, num_heads=2)

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

    pipe = WanVACEPipeline(
        tokenizer=Tok(), text_encoder=(te, te.init_params(key)),
        transformer=(transformer, transformer.init_params(key)),
        vae=(vae, vae.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(),
    )
    out = pipe("replace the sky", height=16, width=16, num_frames=5,
               num_inference_steps=2, guidance_scale=5.0, key=key,
               max_sequence_length=8, output_type="np")
    assert out.frames.shape[0] == 1 and out.frames.shape[-1] == 3
    assert np.isfinite(out.frames).all()
