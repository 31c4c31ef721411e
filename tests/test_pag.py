"""Perturbed Attention Guidance: identity self-attention parity vs the
reference processor, and PAG pipeline behavior."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

torch = pytest.importorskip("torch")


def test_pag_identity_attention_matches_reference():
    """Our pag_identity branch == reference PAGIdentitySelfAttnProcessor2_0's
    perturbed half."""
    from diffusers.models.attention_processor import (
        Attention as TorchAttention,
        PAGIdentitySelfAttnProcessor2_0,
    )

    from diffusers_tpu.models.attention import Attention
    from diffusers_tpu.models.modeling_utils import convert_torch_state_dict

    torch.manual_seed(0)
    ref = TorchAttention(query_dim=32, heads=4, dim_head=8, bias=False, out_bias=True)
    ref.set_processor(PAGIdentitySelfAttnProcessor2_0())

    ours = Attention(query_dim=32, heads=4, dim_head=8, bias=False, out_bias=True)
    params = convert_torch_state_dict(ours, {k: v.numpy() for k, v in ref.state_dict().items()})

    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 32).astype(np.float32)  # batch 2: [org, perturbed]
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(np.concatenate([x, x], axis=0))).numpy()
    ref_org, ref_ptb = ref_out[:2], ref_out[2:]

    normal = np.asarray(ours(params, jnp.asarray(x)))
    ours.pag_identity = True
    perturbed = np.asarray(ours(params, jnp.asarray(x)))
    ours.pag_identity = False

    assert np.max(np.abs(normal - ref_org)) < 5e-5
    assert np.max(np.abs(perturbed - ref_ptb)) < 5e-5
    assert np.max(np.abs(perturbed - normal)) > 1e-3  # actually perturbs


def test_pag_pipeline_smoke():
    from diffusers_tpu.pipelines.pag.pipeline_pag_sd import StableDiffusionPAGPipeline
    from test_pipeline_stable_diffusion import get_dummy_pipeline

    base = get_dummy_pipeline()
    comps = {k: v for k, v in base.components.items() if k not in ("image_encoder", "feature_extractor")}
    pipe = StableDiffusionPAGPipeline(**comps)
    kwargs = dict(num_inference_steps=3, guidance_scale=6.0, key=jax.random.PRNGKey(0), output_type="np")

    plain = base("a photo of a cat", **kwargs).images
    zero_pag = pipe("a photo of a cat", pag_scale=0.0, pag_applied_layers="attn1", **kwargs).images
    assert np.max(np.abs(zero_pag - plain)) < 1e-4  # pag_scale=0 ≡ plain CFG

    with_pag = pipe("a photo of a cat", pag_scale=3.0, pag_applied_layers="attn1", **kwargs).images
    assert with_pag.shape == plain.shape and np.isfinite(with_pag).all()
    assert np.max(np.abs(with_pag - plain)) > 1e-5


def test_pag_guider_formula():
    from diffusers_tpu.guiders import PerturbedAttentionGuidance

    g = PerturbedAttentionGuidance(
        guidance_scale=5.0, perturbed_guidance_scale=2.0,
        perturbed_guidance_start=0.0, perturbed_guidance_stop=1.0,
    )
    rng = np.random.RandomState(0)
    cond, uncond, skip = (jnp.asarray(rng.randn(1, 4).astype(np.float32)) for _ in range(3))
    out = g(cond, uncond, skip, step=0, num_steps=10)
    expected = uncond + 5.0 * (cond - uncond) + 2.0 * (cond - skip)
    assert np.max(np.abs(np.asarray(out - expected))) < 1e-6

    # outside the pag window only CFG applies
    g2 = PerturbedAttentionGuidance(
        guidance_scale=5.0, perturbed_guidance_scale=2.0,
        perturbed_guidance_start=0.0, perturbed_guidance_stop=0.2,
    )
    out2 = g2(cond, uncond, skip, step=5, num_steps=10)
    expected2 = uncond + 5.0 * (cond - uncond)
    assert np.max(np.abs(np.asarray(out2 - expected2))) < 1e-6


def test_skip_layer_guidance_on_sd3():
    """layer_skip flag turns SD3 blocks into identities; SLG forward differs
    from the plain conditional and the formula composes."""
    from diffusers_tpu.guiders import SkipLayerGuidance, layers_skipped, select_skip_blocks
    from diffusers_tpu.models.transformers.transformer_sd3 import SD3Transformer2DModel

    model = SD3Transformer2DModel(
        sample_size=8, patch_size=2, in_channels=4, num_layers=2,
        attention_head_dim=8, num_attention_heads=2, joint_attention_dim=16,
        caption_projection_dim=16, pooled_projection_dim=16, out_channels=4,
    )
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
    ehs = jnp.asarray(rng.randn(1, 6, 16).astype(np.float32))
    pooled = jnp.asarray(rng.randn(1, 16).astype(np.float32))
    t = jnp.asarray([500.0])

    normal = np.asarray(model(params, x, ehs, pooled, t).sample)
    blocks = select_skip_blocks(model, [1])
    with layers_skipped(blocks):
        skipped = np.asarray(model(params, x, ehs, pooled, t).sample)
    after = np.asarray(model(params, x, ehs, pooled, t).sample)

    assert np.max(np.abs(skipped - normal)) > 1e-4  # skipping changed the output
    assert np.max(np.abs(after - normal)) < 1e-6  # flag is restored

    g = SkipLayerGuidance(guidance_scale=4.0, skip_layer_guidance_scale=2.0,
                          skip_layer_guidance_start=0.0, skip_layer_guidance_stop=1.0)
    cond, uncond, skip = (jnp.asarray(rng.randn(1, 4).astype(np.float32)) for _ in range(3))
    out = g(cond, uncond, skip, step=0, num_steps=10)
    expected = uncond + 4.0 * (cond - uncond) + 2.0 * (cond - skip)
    assert np.max(np.abs(np.asarray(out - expected))) < 1e-6
