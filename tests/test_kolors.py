"""Kolors: ChatGLM parity against the reference torch implementation +
pipeline smoke."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

GLM_KWARGS = dict(
    num_layers=2,
    padded_vocab_size=60,
    hidden_size=32,
    ffn_hidden_size=48,
    kv_channels=8,
    num_attention_heads=4,
    seq_length=64,
    multi_query_attention=True,
    multi_query_group_num=2,
    add_qkv_bias=True,
)


def test_chatglm_parity():
    torch = pytest.importorskip("torch")
    from diffusers.pipelines.kolors.text_encoder import ChatGLMConfig
    from diffusers.pipelines.kolors.text_encoder import ChatGLMModel as TorchGLM

    from diffusers_tpu.pipelines.kolors.text_encoder import ChatGLMModel

    cfg = ChatGLMConfig(original_rope=True, **GLM_KWARGS)
    tm = TorchGLM(cfg, empty_init=False)
    # the reference leaves RMSNorm.weight as torch.empty garbage
    # (_init_weights is a no-op) — seed every param deterministically
    torch.manual_seed(0)
    for p in tm.parameters():
        p.data.normal_(0.0, 0.05)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = ChatGLMModel(**GLM_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    ids = rng.randint(1, 60, size=(2, 7))
    mask = np.ones((2, 7), dtype=np.int64)
    mask[0, 5:] = 0
    with torch.no_grad():
        ref = tm(
            torch.from_numpy(ids), attention_mask=torch.from_numpy(mask),
            output_hidden_states=True, use_cache=False, return_dict=True,
        )
    out = m(params, jnp.asarray(ids), attention_mask=jnp.asarray(mask), output_hidden_states=True)

    # reference layout is [S, B, H]; ours is [B, S, H]
    ref_last = ref.last_hidden_state.numpy().transpose(1, 0, 2)
    got_last = np.asarray(out.last_hidden_state)
    # padded-position outputs may differ (reference lets pad queries attend
    # everywhere too — we mirror that, so compare everything)
    assert np.max(np.abs(got_last - ref_last)) < 5e-4, np.max(np.abs(got_last - ref_last))

    assert len(out.hidden_states) == len(ref.hidden_states)
    ref_h2 = ref.hidden_states[-2].numpy().transpose(1, 0, 2)
    got_h2 = np.asarray(out.hidden_states[-2])
    assert np.max(np.abs(got_h2 - ref_h2)) < 5e-4
    ref_pooled = ref.hidden_states[-1].numpy()[-1, :, :]
    got_pooled = np.asarray(out.hidden_states[-1][:, -1, :])
    assert np.max(np.abs(got_pooled - ref_pooled)) < 5e-4


def test_kolors_pipeline_smoke():
    from diffusers_tpu.models.autoencoders.autoencoder_kl import AutoencoderKL
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
    from diffusers_tpu.pipelines.kolors import ChatGLMModel, KolorsPipeline
    from diffusers_tpu.schedulers.scheduling_euler_discrete import EulerDiscreteScheduler

    key = jax.random.PRNGKey(0)
    te = ChatGLMModel(**GLM_KWARGS)
    unet = UNet2DConditionModel(
        sample_size=8, in_channels=4, out_channels=4,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=16,
        cross_attention_dim=40, attention_head_dim=4,
        encoder_hid_dim=32, encoder_hid_dim_type="text_proj",
        addition_embed_type="text_time", addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=32 + 6 * 8,
    )
    vae = AutoencoderKL(
        in_channels=3, out_channels=3, down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, block_out_channels=(32, 32),
        layers_per_block=1, latent_channels=4, norm_num_groups=32, scaling_factor=0.13,
    )

    class Tok:
        model_max_length = 16

        def __call__(self, prompts, padding=None, max_length=16, truncation=True, return_tensors="np"):
            class Out:
                pass

            o = Out()
            ids, masks = [], []
            for p in prompts:
                n = len(p) % 4 + 2
                ids.append([((hash(p) + i) % 50) + 2 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    pipe = KolorsPipeline(
        vae=(vae, vae.init_params(key)), text_encoder=(te, te.init_params(key)),
        tokenizer=Tok(), unet=(unet, unet.init_params(key)),
        scheduler=EulerDiscreteScheduler(),
    )
    out = pipe("a watercolor fox", height=16, width=16, num_inference_steps=2,
               guidance_scale=5.0, key=key, max_sequence_length=16, output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()
