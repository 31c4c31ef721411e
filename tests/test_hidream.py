"""HiDream-I1 transformer parity (MoE routing included) + pipeline smoke."""

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
    out_channels=4,
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=8,
    num_attention_heads=4,
    caption_channels=[24, 16],  # [t5, llama]
    text_emb_dim=20,
    num_routed_experts=4,
    num_activated_experts=2,
    axes_dims_rope=(4, 2, 2),
    max_resolution=(16, 16),
    llama_layers=[0, 1, 0, 1],
    force_inference_output=True,
)


def test_hidream_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import HiDreamImageTransformer2DModel as TorchModel

    from diffusers_tpu.models.transformers.transformer_hidream_image import (
        HiDreamImageTransformer2DModel,
    )

    tm = TorchModel(**TF_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = HiDreamImageTransformer2DModel(**TF_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 8, 8).astype(np.float32)
    t5 = rng.randn(2, 6, 24).astype(np.float32)
    llama = rng.randn(2, 2, 5, 16).astype(np.float32)  # [num_layers_stack=2, B, S, D]
    pooled = rng.randn(2, 20).astype(np.float32)
    t = np.array([0.3, 0.8], dtype=np.float32)

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x), torch.from_numpy(t),
            encoder_hidden_states_t5=torch.from_numpy(t5),
            encoder_hidden_states_llama3=torch.from_numpy(llama).transpose(0, 1).transpose(0, 1),
            pooled_embeds=torch.from_numpy(pooled),
        ).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), jnp.asarray(t),
          encoder_hidden_states_t5=jnp.asarray(t5),
          encoder_hidden_states_llama3=jnp.asarray(llama),
          pooled_embeds=jnp.asarray(pooled)).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-3, np.max(np.abs(out - ref))


class Tok:
    model_max_length = 77

    def __call__(self, prompts, padding=None, max_length=8, truncation=True, return_tensors="np"):
        class Out:
            pass

        max_length = min(max_length, 8)
        o = Out()
        ids, masks = [], []
        for p in prompts:
            n = len(p) % 3 + 2
            ids.append([((hash(p) + i) % 40) + 2 for i in range(n)] + [0] * (max_length - n))
            masks.append([1] * n + [0] * (max_length - n))
        o.input_ids = np.array(ids)
        o.attention_mask = np.array(masks)
        return o


def test_hidream_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.text_encoders.clip import CLIPTextModelWithProjection
    from diffusers_tpu.models.text_encoders.llama import LlamaModel
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel
    from diffusers_tpu.models.transformers.transformer_hidream_image import (
        HiDreamImageTransformer2DModel,
    )
    from diffusers_tpu.pipelines.hidream_image import HiDreamImagePipeline
    from diffusers_tpu.schedulers.scheduling_flow_match_euler_discrete import (
        FlowMatchEulerDiscreteScheduler,
    )

    key = jax.random.PRNGKey(0)
    transformer = HiDreamImageTransformer2DModel(**{**TF_KWARGS, "text_emb_dim": 24})
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, block_out_channels=(32, 32),
        layers_per_block=1, latent_channels=4, norm_num_groups=32, scaling_factor=0.13,
    )
    clip = CLIPTextModelWithProjection(
        vocab_size=50, hidden_size=16, intermediate_size=24, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=77, projection_dim=12,
    )
    t5 = T5EncoderModel(vocab_size=50, d_model=24, d_kv=8, d_ff=32, num_layers=2, num_heads=2)
    llama = LlamaModel(
        vocab_size=50, hidden_size=16, intermediate_size=24, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2,
    )
    pipe = HiDreamImagePipeline(
        scheduler=FlowMatchEulerDiscreteScheduler(use_dynamic_shifting=True),
        vae=(vae, vae.init_params(key)),
        text_encoder=(clip, clip.init_params(key)), tokenizer=Tok(),
        text_encoder_2=(clip, clip.init_params(jax.random.PRNGKey(1))), tokenizer_2=Tok(),
        text_encoder_3=(t5, t5.init_params(key)), tokenizer_3=Tok(),
        text_encoder_4=(llama, llama.init_params(key)), tokenizer_4=Tok(),
        transformer=(transformer, transformer.init_params(key)),
    )
    out = pipe("a brass compass", height=16, width=16, num_inference_steps=2,
               guidance_scale=5.0, key=key, max_sequence_length=8, output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()
