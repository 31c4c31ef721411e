"""Sana-Video transformer parity + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TF_KWARGS = dict(
    in_channels=4,
    out_channels=4,
    num_attention_heads=2,
    attention_head_dim=12,
    num_layers=2,
    num_cross_attention_heads=2,
    cross_attention_head_dim=12,
    cross_attention_dim=24,
    caption_channels=20,
    mlp_ratio=2.0,
    attention_bias=False,
    sample_size=8,
    patch_size=(1, 2, 2),
    qk_norm="rms_norm_across_heads",
    rope_max_seq_len=64,
)


def test_sana_video_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import SanaVideoTransformer3DModel as TorchModel

    from diffusers_tpu.models.transformers.transformer_sana_video import (
        SanaVideoTransformer3DModel,
    )

    tm = TorchModel(**TF_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = SanaVideoTransformer3DModel(**TF_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 2, 8, 8).astype(np.float32)
    ehs = rng.randn(2, 6, 20).astype(np.float32)
    enc_mask = np.ones((2, 6), dtype=np.int64)
    enc_mask[0, 4:] = 0
    t = np.array([4, 9], dtype=np.int64)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(ehs), torch.from_numpy(t),
                 encoder_attention_mask=torch.from_numpy(enc_mask)).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(ehs), jnp.asarray(t),
          encoder_attention_mask=jnp.asarray(enc_mask)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3, np.max(np.abs(out - ref))


def test_sana_video_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_wan import AutoencoderKLWan
    from diffusers_tpu.models.text_encoders.gemma import Gemma2Model
    from diffusers_tpu.models.transformers.transformer_sana_video import (
        SanaVideoTransformer3DModel,
    )
    from diffusers_tpu.pipelines.sana_video import SanaVideoPipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    transformer = SanaVideoTransformer3DModel(**TF_KWARGS)
    vae = AutoencoderKLWan(
        base_dim=16, z_dim=4, dim_mult=[1, 2], num_res_blocks=1,
        attn_scales=[], temperal_downsample=[False, False], dropout=0.0,
        scale_factor_spatial=2, scale_factor_temporal=1,
    )
    te = Gemma2Model(
        vocab_size=64, hidden_size=20, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, head_dim=10,
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
                ids.append([((hash(p) + i) % 50) + 2 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = SanaVideoPipeline(
        tokenizer=Tok(), text_encoder=(te, te.init_params(key)),
        vae=(vae, vae.init_params(key)),
        transformer=(transformer, transformer.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(),
    )
    out = pipe("waves crashing. motion score: 30.", height=16, width=16, num_frames=2,
               num_inference_steps=2, guidance_scale=6.0, key=key,
               max_sequence_length=8, output_type="np")
    assert out.frames.shape[0] == 1 and out.frames.shape[-1] == 3
    assert np.isfinite(out.frames).all()
