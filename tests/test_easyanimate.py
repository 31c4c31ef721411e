"""EasyAnimate transformer parity + pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TF_KWARGS = dict(
    num_attention_heads=2,
    attention_head_dim=16,
    in_channels=4,
    out_channels=4,
    patch_size=2,
    sample_width=8,
    sample_height=8,
    num_layers=2,
    mmdit_layers=1,
    time_embed_dim=16,
    text_embed_dim=24,
    norm_eps=1e-5,
    after_norm=False,
)


def test_easyanimate_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import EasyAnimateTransformer3DModel as TorchModel

    from diffusers_tpu.models.transformers.transformer_easyanimate import (
        EasyAnimateTransformer3DModel,
    )

    tm = TorchModel(**TF_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = EasyAnimateTransformer3DModel(**TF_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 2, 8, 8).astype(np.float32)
    ehs = rng.randn(2, 5, 24).astype(np.float32)
    t = np.array([5, 11], dtype=np.int64)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t),
                 encoder_hidden_states=torch.from_numpy(ehs)).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t), encoder_hidden_states=jnp.asarray(ehs)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_easyanimate_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl_cogvideox import AutoencoderKLCogVideoX
    from diffusers_tpu.models.text_encoders.gemma import Gemma2Model
    from diffusers_tpu.models.transformers.transformer_easyanimate import (
        EasyAnimateTransformer3DModel,
    )
    from diffusers_tpu.pipelines.easyanimate import EasyAnimatePipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    transformer = EasyAnimateTransformer3DModel(**TF_KWARGS)
    vae = AutoencoderKLCogVideoX(
        in_channels=3, out_channels=3, down_block_types=("CogVideoXDownBlock3D",) * 2,
        up_block_types=("CogVideoXUpBlock3D",) * 2, block_out_channels=(32, 32),
        layers_per_block=1, latent_channels=4, norm_num_groups=32,
        temporal_compression_ratio=1, scaling_factor=0.7,
    )
    te = Gemma2Model(
        vocab_size=64, hidden_size=24, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=1, head_dim=12,
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

    pipe = EasyAnimatePipeline(
        vae=(vae, vae.init_params(key)), text_encoder=(te, te.init_params(key)),
        tokenizer=Tok(), transformer=(transformer, transformer.init_params(key)),
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
    )
    out = pipe("lava flowing", height=16, width=16, num_frames=2,
               num_inference_steps=2, guidance_scale=6.0, guidance_rescale=0.7,
               key=key, max_sequence_length=8, output_type="np")
    assert out.frames.shape[0] == 1 and out.frames.shape[-1] == 3
    assert np.isfinite(out.frames).all()
