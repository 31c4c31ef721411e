"""ControlNetModel parity vs torch reference + UNet residual-injection parity."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.controlnets.controlnet import ControlNetModel
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel

sys.path.insert(0, "/root/reference/src")

CN_CFG = dict(
    in_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    block_out_channels=(32, 64),
    layers_per_block=2,
    attention_head_dim=8,
    cross_attention_dim=32,
    norm_num_groups=32,
    conditioning_embedding_out_channels=(16, 32),
)

UNET_CFG = dict(
    sample_size=16,
    in_channels=4,
    out_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    block_out_channels=(32, 64),
    layers_per_block=2,
    attention_head_dim=8,
    cross_attention_dim=32,
    norm_num_groups=32,
)


def test_controlnet_parity_and_unet_injection():
    torch = pytest.importorskip("torch")
    from diffusers import ControlNetModel as TorchCN, UNet2DConditionModel as TorchUNet

    tcn = TorchCN(**CN_CFG)
    tcn.eval()
    cn = ControlNetModel(**CN_CFG)
    cn_params = convert_torch_state_dict(cn, {k: v.detach().numpy() for k, v in tcn.state_dict().items()})

    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 16, 16).astype(np.float32)
    ehs = rng.randn(1, 8, 32).astype(np.float32)
    cond = rng.rand(1, 3, 32, 32).astype(np.float32)  # conditioning at 2x (2 conv strides)

    with torch.no_grad():
        ref = tcn(
            torch.from_numpy(x), 5, torch.from_numpy(ehs),
            controlnet_cond=torch.from_numpy(cond), conditioning_scale=0.7, return_dict=True,
        )
    out = cn(cn_params, jnp.asarray(x), 5, jnp.asarray(ehs), jnp.asarray(cond), conditioning_scale=0.7)

    assert len(out.down_block_res_samples) == len(ref.down_block_res_samples)
    for mine, theirs in zip(out.down_block_res_samples, ref.down_block_res_samples):
        assert np.max(np.abs(np.asarray(mine) - theirs.numpy())) < 5e-5
    assert np.max(np.abs(np.asarray(out.mid_block_res_sample) - ref.mid_block_res_sample.numpy())) < 5e-5

    # UNet injection parity
    tu = TorchUNet(**UNET_CFG)
    tu.eval()
    u = UNet2DConditionModel(**UNET_CFG)
    u_params = convert_torch_state_dict(u, {k: v.detach().numpy() for k, v in tu.state_dict().items()})
    with torch.no_grad():
        ref_out = tu(
            torch.from_numpy(x), 5, torch.from_numpy(ehs),
            down_block_additional_residuals=[r.clone() for r in ref.down_block_res_samples],
            mid_block_additional_residual=ref.mid_block_res_sample.clone(),
        ).sample.numpy()
    mine_out = np.asarray(
        u(
            u_params, jnp.asarray(x), 5, jnp.asarray(ehs),
            down_block_additional_residuals=out.down_block_res_samples,
            mid_block_additional_residual=out.mid_block_res_sample,
        ).sample
    )
    assert np.max(np.abs(mine_out - ref_out)) < 2e-4, np.max(np.abs(mine_out - ref_out))


def test_sdxl_controlnet_pipeline_smoke():
    import jax

    from diffusers_tpu.pipelines.controlnet.pipeline_controlnet_sd_xl import (
        StableDiffusionXLControlNetPipeline,
    )
    from test_pipeline_sdxl import get_dummy_pipeline

    base = get_dummy_pipeline()
    cn = ControlNetModel(
        in_channels=4,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        block_out_channels=(8, 16),
        layers_per_block=1,
        attention_head_dim=(2, 4),
        transformer_layers_per_block=(1, 2),
        use_linear_projection=True,
        cross_attention_dim=32,
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=16 + 6 * 8,
        norm_num_groups=4,
        conditioning_embedding_out_channels=(8, 16),
    )
    cn_params = cn.init_params(jax.random.PRNGKey(1))
    comps = {k: v for k, v in base.components.items() if k not in ("image_encoder", "feature_extractor")}
    pipe = StableDiffusionXLControlNetPipeline(controlnet=(cn, cn_params), **comps)
    cond = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32)
    # dummy VAE has scale factor 1; cond embedding downsamples 2x -> latents at 16
    out = pipe("a bird", image=cond, height=16, width=16, num_inference_steps=2,
               guidance_scale=5.0, controlnet_conditioning_scale=0.8,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 16, 16, 3)
    assert np.isfinite(out.images).all()
