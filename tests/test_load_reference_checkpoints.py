"""Cross-framework checkpoint compatibility: pipelines serialized by the
REFERENCE (torch diffusers save_pretrained) must load directly in this
framework and produce the same model outputs."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


def test_load_reference_sd_pipeline_layout(tmp_path_factory, torch):
    """Reference StableDiffusionPipeline.save_pretrained → our from_pretrained."""
    import json
    import os

    from diffusers import (
        AutoencoderKL as TorchVAE,
        DDIMScheduler as TorchDDIM,
        UNet2DConditionModel as TorchUNet,
    )
    from transformers import CLIPTextConfig, CLIPTextModel as TorchCLIP

    from diffusers_tpu import StableDiffusionPipeline

    tmp_path = tmp_path_factory.mktemp("ref_sd")
    torch.manual_seed(0)
    unet = TorchUNet(
        sample_size=16, in_channels=4, out_channels=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(32, 64), layers_per_block=1, attention_head_dim=4,
        cross_attention_dim=32, norm_num_groups=32,
    )
    vae = TorchVAE(
        in_channels=3, out_channels=3, block_out_channels=(32,),
        down_block_types=("DownEncoderBlock2D",), up_block_types=("UpDecoderBlock2D",),
        latent_channels=4, layers_per_block=1, norm_num_groups=32,
    )
    text_encoder = TorchCLIP(
        CLIPTextConfig(
            vocab_size=1000, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, max_position_embeddings=77, projection_dim=32,
        )
    )
    scheduler = TorchDDIM(beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear")

    # serialize with the REFERENCE components' save_pretrained (the torch
    # pipeline class itself cannot import in this env due to a hub-version
    # mismatch, so model_index.json follows its documented layout)
    unet.save_pretrained(os.path.join(tmp_path, "unet"))
    vae.save_pretrained(os.path.join(tmp_path, "vae"))
    text_encoder.save_pretrained(os.path.join(tmp_path, "text_encoder"))
    scheduler.save_pretrained(os.path.join(tmp_path, "scheduler"))
    with open(os.path.join(tmp_path, "model_index.json"), "w") as f:
        json.dump(
            {
                "_class_name": "StableDiffusionPipeline",
                "_diffusers_version": "0.40.0.dev0",
                "unet": ["diffusers", "UNet2DConditionModel"],
                "vae": ["diffusers", "AutoencoderKL"],
                "text_encoder": ["transformers", "CLIPTextModel"],
                "tokenizer": [None, None],
                "scheduler": ["diffusers", "DDIMScheduler"],
                "safety_checker": [None, None],
                "feature_extractor": [None, None],
                "image_encoder": [None, None],
                "requires_safety_checker": False,
            },
            f,
        )

    ours = StableDiffusionPipeline.from_pretrained(str(tmp_path))
    # components resolved and weights converted
    assert ours.unet[0].config.block_out_channels == [32, 64] or tuple(ours.unet[0].config.block_out_channels) == (32, 64)
    assert ours.scheduler.config.beta_schedule == "scaled_linear"

    # UNet output parity on the loaded weights
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 16, 16).astype(np.float32)
    ehs = rng.randn(1, 8, 32).astype(np.float32)
    with torch.no_grad():
        ref_out = unet(torch.from_numpy(x), 3, torch.from_numpy(ehs)).sample.numpy()
    our_out = np.asarray(ours.unet[0](ours.unet[1], jnp.asarray(x), 3, jnp.asarray(ehs)).sample)
    assert np.max(np.abs(our_out - ref_out)) < 5e-5

    # VAE decode parity
    z = rng.randn(1, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_dec = vae.decode(torch.from_numpy(z)).sample.numpy()
    our_dec = np.asarray(ours.vae[0].decode(ours.vae[1], jnp.asarray(z)).sample)
    assert np.max(np.abs(our_dec - ref_dec)) < 5e-5

    # text encoder parity
    ids = np.array([[1, 5, 7, 2, 0, 0]]) % 1000
    with torch.no_grad():
        ref_te = text_encoder(torch.from_numpy(ids)).last_hidden_state.numpy()
    our_te = np.asarray(ours.text_encoder[0](ours.text_encoder[1], jnp.asarray(ids)).last_hidden_state)
    assert np.max(np.abs(our_te - ref_te)) < 5e-5


def test_load_reference_sharded_model(tmp_path_factory, torch):
    """Reference sharded-safetensors model dir loads through the index file."""
    from diffusers import UNet2DConditionModel as TorchUNet

    from diffusers_tpu import UNet2DConditionModel

    tmp_path = tmp_path_factory.mktemp("ref_sharded")
    unet = TorchUNet(
        sample_size=16, in_channels=4, out_channels=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(32, 64), layers_per_block=1, attention_head_dim=4,
        cross_attention_dim=32, norm_num_groups=32,
    )
    unet.save_pretrained(tmp_path, max_shard_size="200KB")  # force sharding
    import os

    assert os.path.isfile(os.path.join(tmp_path, "diffusion_pytorch_model.safetensors.index.json"))

    model, params = UNet2DConditionModel.from_pretrained(str(tmp_path))
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 16, 16).astype(np.float32)
    ehs = rng.randn(1, 8, 32).astype(np.float32)
    with torch.no_grad():
        ref = unet(torch.from_numpy(x), 9, torch.from_numpy(ehs)).sample.numpy()
    out = np.asarray(model(params, jnp.asarray(x), 9, jnp.asarray(ehs)).sample)
    assert np.max(np.abs(out - ref)) < 5e-5
