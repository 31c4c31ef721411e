"""Weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusers_tpu.models.transformers.transformer_flux import FluxTransformer2DModel
from diffusers_tpu.quantizers import Fp8WeightOnlyConfig, Int8WeightOnlyConfig, dequantize_params, quantize_params

TINY = dict(
    patch_size=1, in_channels=4, num_layers=1, num_single_layers=1,
    attention_head_dim=16, num_attention_heads=4, joint_attention_dim=64,
    pooled_projection_dim=64, axes_dims_rope=(4, 6, 6),
)


def _run(model, params):
    rng = np.random.RandomState(0)
    return model(
        params,
        jnp.asarray(rng.randn(1, 16, 4), jnp.float32),
        encoder_hidden_states=jnp.asarray(rng.randn(1, 8, 64), jnp.float32),
        pooled_projections=jnp.asarray(rng.randn(1, 64), jnp.float32),
        timestep=jnp.asarray([0.5], jnp.float32),
        img_ids=jnp.asarray(rng.randint(0, 4, (16, 3)), jnp.float32),
        txt_ids=jnp.zeros((8, 3), jnp.float32),
    ).sample


def test_int8_quantization_close_and_smaller():
    model = FluxTransformer2DModel(**TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    q_params = quantize_params(params, Int8WeightOnlyConfig(min_weight_size=1024))

    ref = np.asarray(_run(model, params))
    out = np.asarray(_run(model, q_params))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.05, rel

    def nbytes(tree):
        return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))

    assert nbytes(q_params) < 0.55 * nbytes(params)


def test_fp8_quantization_close():
    model = FluxTransformer2DModel(**TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    q_params = quantize_params(params, Fp8WeightOnlyConfig(min_weight_size=1024))
    ref = np.asarray(_run(model, params))
    out = np.asarray(_run(model, q_params))
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.08, rel


def test_dequantize_roundtrip():
    model = FluxTransformer2DModel(**TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    q = quantize_params(params, Int8WeightOnlyConfig(min_weight_size=1024))
    dq = dequantize_params(q)
    k = np.asarray(params["transformer_blocks"][0]["attn"]["to_q"]["kernel"])
    kd = np.asarray(dq["transformer_blocks"][0]["attn"]["to_q"]["kernel"])
    assert np.abs(k - kd).max() < np.abs(k).max() / 100


def test_modules_to_not_convert():
    model = FluxTransformer2DModel(**TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    q = quantize_params(params, Int8WeightOnlyConfig(min_weight_size=0, modules_to_not_convert=["x_embedder"]))
    assert "kernel_scale" not in q["x_embedder"]
    assert "kernel_scale" in q["context_embedder"]
