"""LDMBert parity + LDM t2i / superresolution / DDIM pipeline smokes."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

BERT_KWARGS = dict(
    vocab_size=50,
    max_position_embeddings=16,
    encoder_layers=2,
    encoder_ffn_dim=32,
    encoder_attention_heads=2,
    head_dim=8,
    d_model=16,
)


def test_ldmbert_parity():
    torch = pytest.importorskip("torch")
    # the reference pipeline module needs newer huggingface_hub symbols than
    # the baked-in version provides — stub them before import
    import huggingface_hub
    import huggingface_hub.errors as hferr

    for name in ("get_cached_repo_tree",):
        if not hasattr(huggingface_hub, name):
            setattr(huggingface_hub, name, lambda *a, **k: None)
    for name in ("CachedRepoTreeNotFoundError",):
        if not hasattr(hferr, name):
            setattr(hferr, name, type(name, (Exception,), {}))
    from diffusers.pipelines.latent_diffusion.pipeline_latent_diffusion import (
        LDMBertConfig,
        LDMBertModel as TorchModel,
    )

    from diffusers_tpu.pipelines.latent_diffusion import LDMBertModel

    tm = TorchModel(LDMBertConfig(**BERT_KWARGS))
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = LDMBertModel(**BERT_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 50, size=(2, 10))
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids))[0].numpy()
    out = np.asarray(m(params, jnp.asarray(ids)).last_hidden_state)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 2e-4, np.max(np.abs(out - ref))


class Tok:
    model_max_length = 77

    def __call__(self, prompts, padding=None, max_length=77, truncation=True, return_tensors="np"):
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


def test_ldm_text2image_smoke():
    from diffusers_tpu.models.autoencoders.vq_model import VQModel
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
    from diffusers_tpu.pipelines.latent_diffusion import LDMBertModel, LDMTextToImagePipeline
    from diffusers_tpu.schedulers.scheduling_ddim import DDIMScheduler

    key = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(
        sample_size=4, in_channels=3, out_channels=3,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(8, 16), layers_per_block=1, cross_attention_dim=16,
        norm_num_groups=8, attention_head_dim=2,
    )
    vqvae = VQModel(
        in_channels=3, out_channels=3, down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, block_out_channels=(8, 8),
        layers_per_block=1, latent_channels=3, norm_num_groups=8, num_vq_embeddings=32,
    )
    bert = LDMBertModel(**BERT_KWARGS)
    pipe = LDMTextToImagePipeline(
        vqvae=(vqvae, vqvae.init_params(key)), bert=(bert, bert.init_params(key)),
        tokenizer=Tok(), unet=(unet, unet.init_params(key)),
        scheduler=DDIMScheduler(num_train_timesteps=10),
    )
    # pipeline hardcodes //8 latents like the reference; 32px -> 4x4 latents
    out = pipe("a squirrel eating a burger", height=32, width=32, num_inference_steps=2,
               guidance_scale=6.0, eta=0.3, key=key, output_type="np")
    assert out.images.shape == (1, 8, 8, 3)  # 2-block VQ decodes 4x4 -> 8x8
    assert np.isfinite(out.images).all()


def test_ldm_superresolution_smoke():
    from diffusers_tpu.models.autoencoders.vq_model import VQModel
    from diffusers_tpu.models.unets.unet_2d import UNet2DModel
    from diffusers_tpu.pipelines.latent_diffusion import LDMSuperResolutionPipeline
    from diffusers_tpu.schedulers.scheduling_ddim import DDIMScheduler

    key = jax.random.PRNGKey(0)
    unet = UNet2DModel(
        sample_size=8, in_channels=6, out_channels=3, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, attention_head_dim=4, norm_num_groups=8,
    )
    vqvae = VQModel(
        in_channels=3, out_channels=3, down_block_types=("DownEncoderBlock2D",),
        up_block_types=("UpDecoderBlock2D",), block_out_channels=(8,),
        layers_per_block=1, latent_channels=3, norm_num_groups=8, num_vq_embeddings=32,
    )
    pipe = LDMSuperResolutionPipeline(
        vqvae=(vqvae, vqvae.init_params(key)), unet=(unet, unet.init_params(key)),
        scheduler=DDIMScheduler(num_train_timesteps=10),
    )
    image = np.random.RandomState(0).rand(1, 3, 8, 8).astype(np.float32) * 2 - 1
    out = pipe(image=image, num_inference_steps=2, eta=1.0, key=key, output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()


def test_ddim_pipeline_smoke():
    from diffusers_tpu.models.unets.unet_2d import UNet2DModel
    from diffusers_tpu.pipelines.ddim import DDIMPipeline
    from diffusers_tpu.schedulers.scheduling_ddim import DDIMScheduler

    key = jax.random.PRNGKey(0)
    unet = UNet2DModel(
        sample_size=8, in_channels=3, out_channels=3, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, attention_head_dim=4, norm_num_groups=8,
    )
    pipe = DDIMPipeline(unet=(unet, unet.init_params(key)),
                        scheduler=DDIMScheduler(num_train_timesteps=10))
    out = pipe(batch_size=2, num_inference_steps=3, eta=0.5, key=key, output_type="np")
    assert out.images.shape == (2, 8, 8, 3)
    assert out.images.min() >= 0.0 and out.images.max() <= 1.0
    # deterministic under key
    a = pipe(batch_size=1, num_inference_steps=3, key=jax.random.PRNGKey(5), output_type="np").images
    b = pipe(batch_size=1, num_inference_steps=3, key=jax.random.PRNGKey(5), output_type="np").images
    np.testing.assert_array_equal(a, b)
