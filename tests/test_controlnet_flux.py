"""FluxControlNetModel parity vs torch reference + injection into our transformer."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.models.controlnets.controlnet_flux import FluxControlNetModel
from diffusers_tpu.models.modeling_utils import convert_torch_state_dict
from diffusers_tpu.models.transformers.transformer_flux import FluxTransformer2DModel

sys.path.insert(0, "/root/reference/src")

TINY = dict(
    patch_size=1,
    in_channels=4,
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=16,
    num_attention_heads=2,
    joint_attention_dim=32,
    pooled_projection_dim=32,
    axes_dims_rope=(4, 6, 6),
)


def _inputs():
    rng = np.random.RandomState(0)
    batch, img_seq, txt_seq = 2, 16, 8
    return dict(
        hidden_states=rng.randn(batch, img_seq, 4).astype(np.float32),
        controlnet_cond=rng.randn(batch, img_seq, 4).astype(np.float32),
        encoder_hidden_states=rng.randn(batch, txt_seq, 32).astype(np.float32),
        pooled_projections=rng.randn(batch, 32).astype(np.float32),
        timestep=np.array([0.7, 0.7], dtype=np.float32),
        img_ids=rng.randint(0, 8, (img_seq, 3)).astype(np.float32),
        txt_ids=np.zeros((txt_seq, 3), dtype=np.float32),
    )


@pytest.mark.refparity
@pytest.mark.parametrize("union", [False, True])
def test_flux_controlnet_parity(union):
    torch = pytest.importorskip("torch")
    from diffusers import FluxControlNetModel as TorchCN

    kwargs = dict(TINY)
    if union:
        kwargs["num_mode"] = 3
    tm = TorchCN(**{**kwargs, "axes_dims_rope": list(kwargs["axes_dims_rope"])})
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = FluxControlNetModel(**kwargs)
    params = convert_torch_state_dict(m, sd)

    ins = _inputs()
    mode = np.array([[1], [2]], dtype=np.int64) if union else None
    with torch.no_grad():
        torch_ins = {k: torch.from_numpy(v) for k, v in ins.items()}
        if union:
            torch_ins["controlnet_mode"] = torch.from_numpy(mode)
        ref = tm(**torch_ins, conditioning_scale=0.6)
    jax_ins = {k: jnp.asarray(v) for k, v in ins.items()}
    if union:
        jax_ins["controlnet_mode"] = jnp.asarray(mode)
    out = m(params, conditioning_scale=0.6, **jax_ins)

    assert len(out.controlnet_block_samples) == len(ref.controlnet_block_samples)
    for mine, theirs in zip(out.controlnet_block_samples, ref.controlnet_block_samples):
        assert np.max(np.abs(np.asarray(mine) - theirs.numpy())) < 5e-4
    for mine, theirs in zip(out.controlnet_single_block_samples, ref.controlnet_single_block_samples):
        assert np.max(np.abs(np.asarray(mine) - theirs.numpy())) < 5e-4


@pytest.mark.refparity
def test_flux_controlnet_hint_block_parity():
    torch = pytest.importorskip("torch")
    from diffusers import FluxControlNetModel as TorchCN

    kwargs = dict(TINY, conditioning_embedding_channels=4)
    tm = TorchCN(**{**kwargs, "axes_dims_rope": list(kwargs["axes_dims_rope"])})
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    m = FluxControlNetModel(**kwargs)
    params = convert_torch_state_dict(m, sd)

    ins = _inputs()
    # image conditioning: hint block downsamples 8x -> 32px image gives 4x4=16 tokens
    rng = np.random.RandomState(1)
    cond_img = rng.rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        torch_ins = {k: torch.from_numpy(v) for k, v in ins.items() if k != "controlnet_cond"}
        ref = tm(**torch_ins, controlnet_cond=torch.from_numpy(cond_img), conditioning_scale=1.0)
    jax_ins = {k: jnp.asarray(v) for k, v in ins.items() if k != "controlnet_cond"}
    out = m(params, controlnet_cond=jnp.asarray(cond_img.transpose(0, 2, 3, 1)), conditioning_scale=1.0, **jax_ins)
    for mine, theirs in zip(out.controlnet_block_samples, ref.controlnet_block_samples):
        assert np.max(np.abs(np.asarray(mine) - theirs.numpy())) < 5e-4


@pytest.mark.refparity
def test_flux_transformer_injection_parity():
    torch = pytest.importorskip("torch")
    from diffusers import FluxControlNetModel as TorchCN, FluxTransformer2DModel as TorchFlux

    tcn = TorchCN(**{**TINY, "axes_dims_rope": list(TINY["axes_dims_rope"])})
    tcn.eval()
    tfm = TorchFlux(**{**TINY, "axes_dims_rope": list(TINY["axes_dims_rope"])})
    tfm.eval()

    cn = FluxControlNetModel(**TINY)
    cn_params = convert_torch_state_dict(cn, {k: v.detach().numpy() for k, v in tcn.state_dict().items()})
    fm = FluxTransformer2DModel(**TINY)
    fm_params = convert_torch_state_dict(fm, {k: v.detach().numpy() for k, v in tfm.state_dict().items()})

    ins = _inputs()
    with torch.no_grad():
        torch_ins = {k: torch.from_numpy(v) for k, v in ins.items()}
        cn_ref = tcn(**torch_ins, conditioning_scale=0.8)
        fwd_ins = {k: v for k, v in torch_ins.items() if k != "controlnet_cond"}
        ref = tfm(
            **fwd_ins,
            controlnet_block_samples=cn_ref.controlnet_block_samples,
            controlnet_single_block_samples=cn_ref.controlnet_single_block_samples,
        ).sample.numpy()

    jax_ins = {k: jnp.asarray(v) for k, v in ins.items()}
    cn_out = cn(cn_params, conditioning_scale=0.8, **jax_ins)
    fwd_jax = {k: v for k, v in jax_ins.items() if k != "controlnet_cond"}
    out = np.asarray(
        fm(
            fm_params,
            **fwd_jax,
            controlnet_block_samples=cn_out.controlnet_block_samples,
            controlnet_single_block_samples=cn_out.controlnet_single_block_samples,
        ).sample
    )
    assert np.max(np.abs(out - ref)) < 1e-3, np.max(np.abs(out - ref))


def test_flux_controlnet_from_transformer_zero_residuals():
    fm = FluxTransformer2DModel(**TINY)
    fm_params = fm.init_params(jax.random.PRNGKey(0))
    cn, cn_params = FluxControlNetModel.from_transformer(
        fm, fm_params, num_layers=1, num_single_layers=1,
        attention_head_dim=TINY["attention_head_dim"], num_attention_heads=TINY["num_attention_heads"],
    )
    ins = {k: jnp.asarray(v) for k, v in _inputs().items()}
    out = cn(cn_params, conditioning_scale=1.0, **ins)
    # zero-init residual projections: untrained ControlNet must be a no-op
    for s in out.controlnet_block_samples + out.controlnet_single_block_samples:
        assert float(jnp.abs(s).max()) == 0.0


def test_flux_controlnet_pipeline_smoke():
    from diffusers_tpu.pipelines.flux.pipeline_flux_controlnet import FluxControlNetPipeline
    from test_pipeline_flux import get_dummy_pipeline

    base = get_dummy_pipeline()
    transformer = base.transformer[0]
    cn = FluxControlNetModel(
        patch_size=1, in_channels=4, num_layers=1, num_single_layers=1,
        attention_head_dim=16, num_attention_heads=2, joint_attention_dim=32,
        pooled_projection_dim=32, axes_dims_rope=(4, 6, 6),
    )
    cn_params = cn.init_params(jax.random.PRNGKey(1))
    # give the zero-init residual path some signal so conditioning is active
    # (must be non-constant across features: LayerNorm removes constant shifts)
    cn_params["controlnet_blocks"] = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(7), x.shape) * 0.2,
        cn_params["controlnet_blocks"],
    )
    comps = {k: v for k, v in base.components.items() if k not in ("image_encoder", "feature_extractor")}
    pipe = FluxControlNetPipeline(controlnet=(cn, cn_params), **comps)
    cond = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    out = pipe("a robot", control_image=jnp.asarray(cond), height=32, width=32,
               num_inference_steps=2, guidance_scale=3.5, controlnet_conditioning_scale=0.7,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 32, 32, 3)
    assert np.isfinite(out.images).all()

    # conditioning scale must change the output
    out0 = pipe("a robot", control_image=jnp.asarray(cond), height=32, width=32,
                num_inference_steps=2, guidance_scale=3.5, controlnet_conditioning_scale=0.0,
                key=jax.random.PRNGKey(0), output_type="np")
    assert np.abs(out.images - out0.images).max() > 1e-6


def test_flux_controlnet_union_pipeline_smoke():
    from diffusers_tpu.pipelines.flux.pipeline_flux_controlnet import FluxControlNetPipeline
    from test_pipeline_flux import get_dummy_pipeline

    base = get_dummy_pipeline()
    cn = FluxControlNetModel(
        patch_size=1, in_channels=4, num_layers=1, num_single_layers=1,
        attention_head_dim=16, num_attention_heads=2, joint_attention_dim=32,
        pooled_projection_dim=32, axes_dims_rope=(4, 6, 6), num_mode=3,
    )
    cn_params = cn.init_params(jax.random.PRNGKey(1))
    comps = {k: v for k, v in base.components.items() if k not in ("image_encoder", "feature_extractor")}
    pipe = FluxControlNetPipeline(controlnet=(cn, cn_params), **comps)
    cond = np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1
    out = pipe("a robot", control_image=jnp.asarray(cond), control_mode=1, height=32, width=32,
               num_inference_steps=2, guidance_scale=3.5,
               key=jax.random.PRNGKey(0), output_type="np")
    assert out.images.shape == (1, 32, 32, 3)
    assert np.isfinite(out.images).all()
