"""Cosmos Transfer2.5 ControlNet (reference
`models/controlnets/controlnet_cosmos.py:39`): control residual emission and
injection into CosmosTransformer3DModel every controlnet_block_every_n blocks."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusers_tpu import CosmosControlNetModel
from diffusers_tpu.models.transformers.transformer_cosmos import CosmosTransformer3DModel

CN_KW = dict(
    n_controlnet_blocks=2, in_channels=10, latent_channels=6, model_channels=32,
    num_attention_heads=2, attention_head_dim=16, text_embed_dim=24, adaln_lora_dim=8,
    patch_size=(1, 2, 2), max_size=(4, 8, 8), rope_scale=(1.0, 1.0, 1.0),
)
TF_KW = dict(
    in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=16,
    num_layers=4, text_embed_dim=24, adaln_lora_dim=8, patch_size=(1, 2, 2),
    max_size=(4, 8, 8), rope_scale=(1.0, 1.0, 1.0), controlnet_block_every_n=2,
)


def _inputs(key):
    rng = np.random.RandomState(0)
    controls = jnp.asarray(rng.randn(1, 4, 2, 8, 8), jnp.float32)
    latents = jnp.asarray(rng.randn(1, 4, 2, 8, 8), jnp.float32)
    cmask = jnp.zeros((1, 1, 2, 8, 8), jnp.float32)
    ehs = jnp.asarray(rng.randn(1, 6, 24), jnp.float32)
    return controls, latents, cmask, ehs


def test_controlnet_emits_scaled_residuals():
    key = jax.random.PRNGKey(0)
    cn = CosmosControlNetModel(**CN_KW)
    p = cn.init_params(key)
    controls, latents, cmask, ehs = _inputs(key)
    out = cn(p, controls, latents, jnp.asarray([500.0]), ehs, cmask, conditioning_scale=1.0)
    assert len(out.control_block_samples) == 2
    seq = 2 * (8 // 2) * (8 // 2)
    assert all(s.shape == (1, seq, 32) for s in out.control_block_samples)
    half = cn(p, controls, latents, jnp.asarray([500.0]), ehs, cmask,
              conditioning_scale=0.5).control_block_samples
    np.testing.assert_allclose(np.asarray(half[0]), 0.5 * np.asarray(out.control_block_samples[0]),
                               rtol=1e-5, atol=1e-6)


def test_transformer_injection_every_n_blocks():
    key = jax.random.PRNGKey(1)
    tf = CosmosTransformer3DModel(**TF_KW)
    tp = tf.init_params(key)
    rng = np.random.RandomState(1)
    hidden = jnp.asarray(rng.randn(1, 4, 2, 8, 8), jnp.float32)
    ehs = jnp.asarray(rng.randn(1, 6, 24), jnp.float32)
    seq = 2 * 4 * 4
    residuals = [jnp.asarray(rng.randn(1, seq, 32), jnp.float32) * 0.1 for _ in range(2)]

    base = tf(tp, hidden, jnp.asarray([500.0]), ehs).sample
    zero = tf(tp, hidden, jnp.asarray([500.0]), ehs,
              block_controlnet_hidden_states=[jnp.zeros_like(r) for r in residuals]).sample
    np.testing.assert_allclose(np.asarray(zero), np.asarray(base), atol=1e-5)
    ctrl = tf(tp, hidden, jnp.asarray([500.0]), ehs,
              block_controlnet_hidden_states=residuals).sample
    assert np.abs(np.asarray(ctrl) - np.asarray(base)).max() > 1e-4


def test_img_context_pathway():
    key = jax.random.PRNGKey(2)
    # img_context_dim_out must equal the hidden size: the reference's
    # k_img/v_img take query_dim inputs (transformer_cosmos.py:319-321)
    cn = CosmosControlNetModel(**CN_KW, img_context_dim_in=12, img_context_dim_out=32,
                               use_crossattn_projection=True, crossattn_proj_in_channels=24,
                               encoder_hidden_states_channels=24)
    p = cn.init_params(key)
    controls, latents, cmask, ehs = _inputs(key)
    img_ctx = jnp.asarray(np.random.RandomState(3).randn(1, 4, 12), jnp.float32)
    out = cn(p, controls, latents, jnp.asarray([500.0]), (ehs, img_ctx), cmask)
    assert len(out.control_block_samples) == 2
    no_img = cn(p, controls, latents, jnp.asarray([500.0]), (ehs, None), cmask)
    assert np.abs(np.asarray(out.control_block_samples[0])
                  - np.asarray(no_img.control_block_samples[0])).max() > 1e-5
