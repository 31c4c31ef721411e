"""DeepFloyd IF: addition_embed_type='text' UNet parity + pipeline smokes."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

UNET_KWARGS = dict(
    sample_size=16,
    in_channels=3,
    out_channels=6,
    down_block_types=("ResnetDownsampleBlock2D", "SimpleCrossAttnDownBlock2D"),
    up_block_types=("SimpleCrossAttnUpBlock2D", "ResnetUpsampleBlock2D"),
    mid_block_type="UNetMidBlock2DSimpleCrossAttn",
    block_out_channels=(32, 64),
    layers_per_block=1,
    encoder_hid_dim=24,
    encoder_hid_dim_type="text_proj",
    addition_embed_type="text",
    addition_embed_type_num_heads=2,
    cross_attention_dim=32,
    attention_head_dim=8,
    resnet_time_scale_shift="scale_shift",
)


def test_if_unet_parity():
    torch = pytest.importorskip("torch")
    from diffusers import UNet2DConditionModel as TorchUNet

    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel

    tm = TorchUNet(**UNET_KWARGS)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = UNet2DConditionModel(**UNET_KWARGS)
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    ehs = rng.randn(2, 5, 24).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), 11, torch.from_numpy(ehs)).sample.numpy()
    out = np.asarray(m(params, jnp.asarray(x), 11, jnp.asarray(ehs)).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


class Tok:
    model_max_length = 77

    def __call__(self, prompts, padding=None, max_length=77, truncation=True,
                 return_tensors="np", add_special_tokens=True):
        class Out:
            pass

        o = Out()
        ids, masks = [], []
        for p in prompts:
            n = len(p) % 4 + 2
            ids.append([((hash(p) + i) % 60) + 2 for i in range(n)] + [0] * (max_length - n))
            masks.append([1] * n + [0] * (max_length - n))
        o.input_ids = np.array(ids)
        o.attention_mask = np.array(masks)
        return o


def _te(key):
    from diffusers_tpu.models.text_encoders.t5 import T5EncoderModel

    te = T5EncoderModel(vocab_size=70, d_model=24, d_kv=8, d_ff=32, num_layers=2, num_heads=2)
    return te, te.init_params(key)


def test_if_pipeline_smoke():
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
    from diffusers_tpu.pipelines.deepfloyd_if import IFPipeline
    from diffusers_tpu.schedulers.scheduling_ddpm import DDPMScheduler

    key = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(**{**UNET_KWARGS, "sample_size": 16})
    pipe = IFPipeline(
        tokenizer=Tok(), text_encoder=_te(key), unet=(unet, unet.init_params(key)),
        scheduler=DDPMScheduler(variance_type="learned_range", num_train_timesteps=20),
    )
    out = pipe("a photo of a cat", num_inference_steps=2, guidance_scale=5.0, key=key)
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()


def test_if_superresolution_pipeline_smoke():
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel
    from diffusers_tpu.pipelines.deepfloyd_if import IFSuperResolutionPipeline
    from diffusers_tpu.schedulers.scheduling_ddpm import DDPMScheduler

    key = jax.random.PRNGKey(1)
    unet = UNet2DConditionModel(**{
        **UNET_KWARGS, "sample_size": 32, "in_channels": 6,
        "class_embed_type": "timestep",
    })
    pipe = IFSuperResolutionPipeline(
        tokenizer=Tok(), text_encoder=_te(key), unet=(unet, unet.init_params(key)),
        scheduler=DDPMScheduler(variance_type="learned_range", num_train_timesteps=20),
        image_noising_scheduler=DDPMScheduler(num_train_timesteps=20),
    )
    low_res = np.random.RandomState(0).randn(1, 3, 16, 16).astype(np.float32) * 0.1
    out = pipe("a photo of a cat", image=jnp.asarray(low_res), num_inference_steps=2,
               guidance_scale=4.0, noise_level=10, key=key)
    assert out.images.shape == (1, 32, 32, 3)
    assert np.isfinite(out.images).all()
