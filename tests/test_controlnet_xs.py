"""ControlNet-XS parity vs the torch reference: the fused dual-stream
UNetControlNetXSModel forward, apply_control=False, and the from_unet
parameter-tree surgery."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.controlnets.controlnet_xs import (
    ControlNetXSAdapter,
    UNetControlNetXSModel,
)
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    sample_size=8,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    block_out_channels=(8, 16),
    norm_num_groups=4,
    cross_attention_dim=8,
    transformer_layers_per_block=1,
    num_attention_heads=2,
    upcast_attention=False,
    use_linear_projection=True,
    time_embedding_mix=0.5,
    ctrl_conditioning_embedding_out_channels=(2, 2, 4, 4),
    ctrl_learn_time_embedding=True,
    ctrl_block_out_channels=(2, 4),
    ctrl_num_attention_heads=2,
    ctrl_max_norm_num_groups=4,
)


def _inputs(rng):
    return dict(
        sample=rng.randn(2, 4, 8, 8).astype(np.float32),
        timestep=np.int64(500),
        encoder_hidden_states=rng.randn(2, 6, 8).astype(np.float32),
        controlnet_cond=rng.randn(2, 3, 64, 64).astype(np.float32),
        conditioning_scale=0.8,
    )


def test_controlnet_xs_fused_parity():
    torch = pytest.importorskip("torch")
    from diffusers import UNetControlNetXSModel as TorchModel

    tm = TorchModel(**TINY)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = UNetControlNetXSModel(**{k: v for k, v in TINY.items() if k != "upcast_attention"})
    params = convert_torch_state_dict(m, sd)

    rng = np.random.RandomState(0)
    inp = _inputs(rng)
    with torch.no_grad():
        ref = tm(
            sample=torch.from_numpy(inp["sample"]),
            timestep=torch.tensor(500),
            encoder_hidden_states=torch.from_numpy(inp["encoder_hidden_states"]),
            controlnet_cond=torch.from_numpy(inp["controlnet_cond"]),
            conditioning_scale=0.8,
        ).sample.numpy()
        ref_nc = tm(
            sample=torch.from_numpy(inp["sample"]),
            timestep=torch.tensor(500),
            encoder_hidden_states=torch.from_numpy(inp["encoder_hidden_states"]),
            controlnet_cond=torch.from_numpy(inp["controlnet_cond"]),
            apply_control=False,
        ).sample.numpy()

    out = np.asarray(m(
        params, jnp.asarray(inp["sample"]), 500,
        jnp.asarray(inp["encoder_hidden_states"]),
        controlnet_cond=jnp.asarray(inp["controlnet_cond"]),
        conditioning_scale=0.8).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))

    out_nc = np.asarray(m(
        params, jnp.asarray(inp["sample"]), 500,
        jnp.asarray(inp["encoder_hidden_states"]),
        controlnet_cond=jnp.asarray(inp["controlnet_cond"]),
        apply_control=False).sample)
    assert np.max(np.abs(out_nc - ref_nc)) < 5e-4, np.max(np.abs(out_nc - ref_nc))
    # control must actually change the output
    assert np.max(np.abs(out - out_nc)) > 1e-4


def test_controlnet_xs_from_unet_surgery_parity():
    torch = pytest.importorskip("torch")
    from diffusers import ControlNetXSAdapter as TorchAdapter
    from diffusers import UNet2DConditionModel as TorchUNet
    from diffusers import UNetControlNetXSModel as TorchModel

    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel

    unet_cfg = dict(
        sample_size=8, in_channels=4, out_channels=4, layers_per_block=2,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(8, 16), norm_num_groups=4, cross_attention_dim=8,
        attention_head_dim=2, use_linear_projection=True,
    )
    t_unet = TorchUNet(**unet_cfg)
    t_ctrl = TorchAdapter.from_unet(t_unet, size_ratio=0.5, learn_time_embedding=True,
                                    conditioning_embedding_out_channels=(2, 2, 4, 4))
    t_fused = TorchModel.from_unet(t_unet, t_ctrl)
    t_fused.eval()

    unet = UNet2DConditionModel(**unet_cfg)
    unet_params = convert_torch_state_dict(
        unet, {k: v.detach().numpy() for k, v in t_unet.state_dict().items()})
    ctrl = ControlNetXSAdapter.from_unet(unet, size_ratio=0.5, learn_time_embedding=True,
                                         conditioning_embedding_out_channels=(2, 2, 4, 4))
    ctrl_params = convert_torch_state_dict(
        ctrl, {k: v.detach().numpy() for k, v in t_ctrl.state_dict().items()})

    model, params = UNetControlNetXSModel.from_unet(unet, unet_params, ctrl, ctrl_params)

    rng = np.random.RandomState(1)
    inp = _inputs(rng)
    with torch.no_grad():
        ref = t_fused(
            sample=torch.from_numpy(inp["sample"]),
            timestep=torch.tensor(500),
            encoder_hidden_states=torch.from_numpy(inp["encoder_hidden_states"]),
            controlnet_cond=torch.from_numpy(inp["controlnet_cond"]),
            conditioning_scale=0.8,
        ).sample.numpy()
    out = np.asarray(model(
        params, jnp.asarray(inp["sample"]), 500,
        jnp.asarray(inp["encoder_hidden_states"]),
        controlnet_cond=jnp.asarray(inp["controlnet_cond"]),
        conditioning_scale=0.8).sample)
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 5e-4, np.max(np.abs(out - ref))


def _fused_from_dummy_unet(unet_cfg, cond_embed_channels=(2, 2)):
    from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel

    unet = UNet2DConditionModel(**unet_cfg)
    unet_params = unet.init_params(jax.random.PRNGKey(3))
    ctrl = ControlNetXSAdapter.from_unet(
        unet, size_ratio=0.5, conditioning_embedding_out_channels=cond_embed_channels)
    ctrl_params = ctrl.init_params(jax.random.PRNGKey(4))
    return UNetControlNetXSModel.from_unet(unet, unet_params, ctrl, ctrl_params)


def test_sd_controlnet_xs_pipeline_smoke():
    from diffusers_tpu.pipelines.controlnet_xs import StableDiffusionControlNetXSPipeline
    from tests.test_pipeline_stable_diffusion import get_dummy_pipeline

    base = get_dummy_pipeline()
    fused = _fused_from_dummy_unet(dict(
        sample_size=8, in_channels=4, out_channels=4, layers_per_block=2,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(8, 16), attention_head_dim=2,
        cross_attention_dim=16, norm_num_groups=4))
    comps = {k: v for k, v in base.components.items()
             if k in ("vae", "text_encoder", "tokenizer", "scheduler")}
    pipe = StableDiffusionControlNetXSPipeline(unet=fused, **comps)
    rng = np.random.RandomState(0)
    cond = rng.rand(1, 3, 16, 16).astype(np.float32)
    out = pipe("a bird", image=cond, height=8, width=8, num_inference_steps=2,
               guidance_scale=6.0, controlnet_conditioning_scale=0.7,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()


def test_sdxl_controlnet_xs_pipeline_smoke():
    from diffusers_tpu.pipelines.controlnet_xs import StableDiffusionXLControlNetXSPipeline
    from tests.test_pipeline_sdxl import get_dummy_pipeline as get_sdxl

    base = get_sdxl()
    fused = _fused_from_dummy_unet(dict(
        sample_size=8, in_channels=4, out_channels=4, layers_per_block=2,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(8, 16), attention_head_dim=(2, 4),
        transformer_layers_per_block=(1, 2), use_linear_projection=True,
        cross_attention_dim=32, addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=16 + 6 * 8, norm_num_groups=4),
        cond_embed_channels=(2,))  # SDXL dummy VAE has scale factor 1: hint stays at latent res
    comps = {k: v for k, v in base.components.items()
             if k in ("vae", "text_encoder", "text_encoder_2", "tokenizer",
                      "tokenizer_2", "scheduler")}
    pipe = StableDiffusionXLControlNetXSPipeline(unet=fused, **comps)
    rng = np.random.RandomState(1)
    cond = rng.rand(1, 3, 16, 16).astype(np.float32)
    out = pipe("an astronaut", image=cond, height=16, width=16, num_inference_steps=2,
               guidance_scale=5.0, controlnet_conditioning_scale=0.7,
               key=jax.random.PRNGKey(0), output_type="np")
    assert np.asarray(out.images).shape[0] == 1
    assert np.isfinite(np.asarray(out.images)).all()
