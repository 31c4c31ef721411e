"""Kandinsky 2.2 parity (prior transformer, added-KV UNet, MoVQ) + pipeline
smokes."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

UNET_KWARGS = dict(
    in_channels=4,
    out_channels=8,
    addition_embed_type="image",
    down_block_types=("ResnetDownsampleBlock2D", "SimpleCrossAttnDownBlock2D"),
    up_block_types=("SimpleCrossAttnUpBlock2D", "ResnetUpsampleBlock2D"),
    mid_block_type="UNetMidBlock2DSimpleCrossAttn",
    block_out_channels=(32, 64),
    layers_per_block=1,
    encoder_hid_dim=32,
    encoder_hid_dim_type="image_proj",
    cross_attention_dim=32,
    attention_head_dim=4,
    resnet_time_scale_shift="scale_shift",
)

MOVQ_KWARGS = dict(
    block_out_channels=[32, 64],
    down_block_types=["DownEncoderBlock2D", "AttnDownEncoderBlock2D"],
    in_channels=3,
    latent_channels=4,
    layers_per_block=1,
    norm_num_groups=8,
    norm_type="spatial",
    num_vq_embeddings=12,
    out_channels=3,
    up_block_types=["AttnUpDecoderBlock2D", "UpDecoderBlock2D"],
    vq_embed_dim=4,
)

PRIOR_KWARGS = dict(
    num_attention_heads=2,
    attention_head_dim=8,
    num_layers=2,
    embedding_dim=16,
    num_embeddings=7,
    additional_embeddings=4,
)


def test_prior_transformer_parity():
    torch = pytest.importorskip("torch")
    from diffusers import PriorTransformer as TorchModel

    from diffusers_tpu.models.transformers.prior_transformer import PriorTransformer

    tm = TorchModel(**PRIOR_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = PriorTransformer(**PRIOR_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 16).astype(np.float32)
    proj = rng.randn(2, 16).astype(np.float32)
    ehs = rng.randn(2, 7, 16).astype(np.float32)
    mask = np.ones((2, 7), dtype=np.int64)
    mask[0, 5:] = 0
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), 5, torch.from_numpy(proj),
                 encoder_hidden_states=torch.from_numpy(ehs),
                 attention_mask=torch.from_numpy(mask).bool()).predicted_image_embedding.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), 5, jnp.asarray(proj),
          encoder_hidden_states=jnp.asarray(ehs),
          attention_mask=jnp.asarray(mask)).predicted_image_embedding
    )
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_kandinsky_unet_parity():
    torch = pytest.importorskip("torch")
    from diffusers import UNet2DConditionModel as TorchUNet

    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel

    tm = TorchUNet(**UNET_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = UNet2DConditionModel(**UNET_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    image_embeds = rng.randn(2, 32).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), 7, None,
                 added_cond_kwargs={"image_embeds": torch.from_numpy(image_embeds)}).sample.numpy()
    out = np.asarray(
        m(params, jnp.asarray(x), 7, None,
          added_cond_kwargs={"image_embeds": jnp.asarray(image_embeds)}).sample
    )
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_movq_parity():
    torch = pytest.importorskip("torch")
    from diffusers import VQModel as TorchVQ

    from diffusers_tpu.models.autoencoders.vq_model import VQModel

    tm = TorchVQ(**MOVQ_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = VQModel(**MOVQ_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x)).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def test_kandinsky_pipelines_smoke():
    from diffusers_tpu.models.autoencoders.vq_model import VQModel
    from diffusers_tpu.models.text_encoders.clip import CLIPTextModelWithProjection
    from diffusers_tpu.models.transformers.prior_transformer import PriorTransformer
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
    from diffusers_tpu.pipelines.kandinsky2_2 import KandinskyV22Pipeline, KandinskyV22PriorPipeline
    from diffusers_tpu.schedulers.scheduling_ddpm import DDPMScheduler
    from diffusers_tpu.schedulers.scheduling_unclip import UnCLIPScheduler

    key = jax.random.PRNGKey(0)
    prior = PriorTransformer(**PRIOR_KWARGS)
    te = CLIPTextModelWithProjection(
        vocab_size=100, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=77, projection_dim=16,
    )

    class Tok:
        model_max_length = 7

        def __call__(self, prompts, padding=None, max_length=7, truncation=True, return_tensors="np"):
            class Out:
                pass

            o = Out()
            ids, masks = [], []
            for p in prompts:
                n = len(p) % 3 + 2
                ids.append([((hash(p) + i) % 80) + 2 for i in range(n)] + [0] * (max_length - n))
                masks.append([1] * n + [0] * (max_length - n))
            o.input_ids = np.array(ids)
            o.attention_mask = np.array(masks)
            return o

    prior_pipe = KandinskyV22PriorPipeline(
        prior=(prior, prior.init_params(key)),
        image_encoder=None,
        text_encoder=(te, te.init_params(key)),
        tokenizer=Tok(),
        scheduler=UnCLIPScheduler(variance_type="fixed_small_log", prediction_type="sample",
                                  clip_sample=True, clip_sample_range=5.0),
    )
    out = prior_pipe("red square", num_inference_steps=2, guidance_scale=4.0, key=key)
    assert out.image_embeds.shape == (1, 16)
    assert np.isfinite(np.asarray(out.image_embeds)).all()

    unet = UNet2DConditionModel(**{**UNET_KWARGS, "encoder_hid_dim": 16, "cross_attention_dim": 32})
    movq = VQModel(**MOVQ_KWARGS)
    decoder_pipe = KandinskyV22Pipeline(
        unet=(unet, unet.init_params(key)),
        scheduler=DDPMScheduler(variance_type="fixed_small"),
        movq=(movq, movq.init_params(key)),
    )
    img = decoder_pipe(
        image_embeds=jnp.asarray(np.asarray(out.image_embeds)),
        negative_image_embeds=jnp.zeros_like(out.image_embeds),
        height=32, width=32, num_inference_steps=2, guidance_scale=4.0, key=key, output_type="np",
    )
    assert img.images.shape[0] == 1 and img.images.shape[-1] == 3
    assert np.isfinite(img.images).all()
