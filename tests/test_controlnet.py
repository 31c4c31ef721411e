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


def _tiny_cn(seed=1):
    import jax

    cn = ControlNetModel(
        in_channels=4,
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        block_out_channels=(8, 16),
        layers_per_block=1,
        attention_head_dim=2,
        cross_attention_dim=16,
        norm_num_groups=4,
        conditioning_embedding_out_channels=(8, 16),
    )
    return cn, cn.init_params(jax.random.PRNGKey(seed))


def test_multicontrolnet_is_sum_of_nets():
    """MultiControlNetModel residuals == sum of per-net residuals at their scales
    (reference `models/controlnets/multicontrolnet.py:27-70`)."""
    from diffusers_tpu.models.controlnets.multicontrolnet import MultiControlNetModel

    (cn_a, p_a), (cn_b, p_b) = _tiny_cn(1), _tiny_cn(2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
    ehs = jnp.asarray(rng.randn(1, 8, 16).astype(np.float32))
    img_a = jnp.asarray(rng.rand(1, 3, 16, 16).astype(np.float32))
    img_b = jnp.asarray(rng.rand(1, 3, 16, 16).astype(np.float32))

    multi = MultiControlNetModel([cn_a, cn_b])
    out = multi(
        [p_a, p_b], x, 5, ehs, [img_a, img_b], conditioning_scale=[0.5, 1.5]
    )
    ref_a = cn_a(p_a, x, 5, ehs, img_a, conditioning_scale=0.5)
    ref_b = cn_b(p_b, x, 5, ehs, img_b, conditioning_scale=1.5)
    for mine, a, b in zip(out.down_block_res_samples, ref_a.down_block_res_samples, ref_b.down_block_res_samples):
        np.testing.assert_allclose(np.asarray(mine), np.asarray(a + b), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.mid_block_res_sample),
        np.asarray(ref_a.mid_block_res_sample + ref_b.mid_block_res_sample),
        atol=1e-6,
    )

    with pytest.raises(ValueError):
        multi([p_a, p_b], x, 5, ehs, [img_a], conditioning_scale=1.0)


def test_multicontrolnet_save_load_roundtrip(tmp_path):
    """Directory layout parity: `dir`, `dir_1`, ... (reference multicontrolnet.py:108-214)."""
    from diffusers_tpu.models.controlnets.multicontrolnet import MultiControlNetModel

    (cn_a, p_a), (cn_b, p_b) = _tiny_cn(1), _tiny_cn(2)
    multi = MultiControlNetModel([cn_a, cn_b])
    multi.save_pretrained(tmp_path / "mcn", params=[p_a, p_b])
    import os

    assert os.path.isdir(tmp_path / "mcn") and os.path.isdir(str(tmp_path / "mcn") + "_1")
    loaded, loaded_params = MultiControlNetModel.from_pretrained(tmp_path / "mcn")
    assert len(loaded) == 2
    import jax

    a_leaves = jax.tree_util.tree_leaves(p_a)
    l_leaves = jax.tree_util.tree_leaves(loaded_params[0])
    assert len(a_leaves) == len(l_leaves)
    for got, want in zip(l_leaves, a_leaves):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_sd_multicontrolnet_pipeline_smoke():
    """Two ControlNets through StableDiffusionControlNetPipeline (list auto-wrap,
    reference `pipeline_controlnet.py` MultiControlNetModel path)."""
    import jax

    from diffusers_tpu.pipelines.controlnet.pipeline_controlnet import StableDiffusionControlNetPipeline
    from test_pipeline_stable_diffusion import get_dummy_pipeline

    base = get_dummy_pipeline()
    (cn_a, p_a), (cn_b, p_b) = _tiny_cn(1), _tiny_cn(2)
    comps = {k: v for k, v in base.components.items() if k not in ("image_encoder", "feature_extractor", "safety_checker")}
    pipe = StableDiffusionControlNetPipeline(controlnet=[(cn_a, p_a), (cn_b, p_b)], **comps)
    rng = np.random.RandomState(0)
    conds = [rng.rand(1, 3, 16, 16).astype(np.float32) for _ in range(2)]
    out = pipe(
        "a bird", image=conds, height=8, width=8, num_inference_steps=2,
        guidance_scale=6.0, controlnet_conditioning_scale=[1.0, 0.5],
        key=jax.random.PRNGKey(0), output_type="np",
    )
    assert out.images.shape == (1, 8, 8, 3)
    assert np.isfinite(out.images).all()


def test_multicontrolnet_union_sum_and_skip():
    """MultiControlNetUnionModel sums per-net residuals and skips scale==0 nets
    (reference `models/controlnets/multicontrolnet_union.py:18`)."""
    import jax

    from diffusers_tpu.models.controlnets.controlnet_union import ControlNetUnionModel
    from diffusers_tpu.models.controlnets.multicontrolnet_union import MultiControlNetUnionModel
    from test_pipeline_variants_r4 import UNION_TINY

    cn_a = ControlNetUnionModel(**UNION_TINY)
    cn_b = ControlNetUnionModel(**UNION_TINY)
    p_a = cn_a.init_params(jax.random.PRNGKey(1))
    p_b = cn_b.init_params(jax.random.PRNGKey(2))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 16, 16).astype(np.float32))
    ehs = jnp.asarray(rng.randn(2, 7, 32).astype(np.float32))
    img = jnp.asarray(rng.rand(2, 3, 32, 32).astype(np.float32))
    added = {
        "text_embeds": jnp.asarray(rng.randn(2, 16).astype(np.float32)),
        "time_ids": jnp.asarray(rng.randn(2, 6).astype(np.float32)),
    }
    ct = np.zeros((2, 6), np.float32)
    ct[:, 1] = 1.0
    ct = jnp.asarray(ct)

    multi = MultiControlNetUnionModel([cn_a, cn_b])
    out = multi(
        [p_a, p_b], x, 7, ehs, [[img], [img]], control_type=[ct, ct],
        control_type_idx=[[1], [1]], conditioning_scale=[1.0, 0.0],
        added_cond_kwargs=added,
    )
    # scale-0 second net skipped -> equals single net at scale 1
    ref = cn_a(p_a, x, 7, ehs, [img], control_type=ct, control_type_idx=[1],
               conditioning_scale=1.0, added_cond_kwargs=added)
    np.testing.assert_allclose(
        np.asarray(out.mid_block_res_sample), np.asarray(ref.mid_block_res_sample), atol=1e-6
    )

    out2 = multi(
        [p_a, p_b], x, 7, ehs, [[img], [img]], control_type=[ct, ct],
        control_type_idx=[[1], [1]], conditioning_scale=[0.5, 0.5],
        added_cond_kwargs=added,
    )
    ref_b = cn_b(p_b, x, 7, ehs, [img], control_type=ct, control_type_idx=[1],
                 conditioning_scale=0.5, added_cond_kwargs=added)
    ref_a = cn_a(p_a, x, 7, ehs, [img], control_type=ct, control_type_idx=[1],
                 conditioning_scale=0.5, added_cond_kwargs=added)
    np.testing.assert_allclose(
        np.asarray(out2.mid_block_res_sample),
        np.asarray(ref_a.mid_block_res_sample + ref_b.mid_block_res_sample),
        atol=1e-6,
    )
