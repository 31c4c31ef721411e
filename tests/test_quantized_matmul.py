"""w8a8 fused Pallas matmul (interpret mode on CPU) vs the float reference,
plus the Int8DynamicActConfig wiring through quantize_params → Linear."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.ops.module import Linear
from diffusers_tpu.ops.pallas.quantized_matmul import quantize_rows, w8a8_matmul
from diffusers_tpu.quantizers import Int8DynamicActConfig
from diffusers_tpu.quantizers.quantize import quantize_params


def _make_qw(rng, k, n):
    w = rng.randn(k, n).astype(np.float32) * 0.02
    absmax = np.maximum(np.abs(w).max(axis=0), 1e-8)
    scale = (absmax / 127.0).astype(np.float32)
    qw = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return jnp.asarray(qw), jnp.asarray(scale)


@pytest.mark.parametrize("m,k,n", [(64, 256, 128), (37, 256, 384), (96, 512, 256)])
def test_w8a8_matches_dequant_reference(m, k, n):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, k), jnp.float32)
    qw, wscale = _make_qw(rng, k, n)
    y = w8a8_matmul(x, qw, wscale, interpret=True)
    ref = np.asarray(x) @ (np.asarray(qw, np.float32) * np.asarray(wscale)[None, :])
    # activation quantization adds ~1/127 relative error
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(y), ref, atol=0.02 * scale)


def test_w8a8_batched_input_and_bias():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 32, 256), jnp.float32)
    qw, wscale = _make_qw(rng, 256, 128)
    bias = jnp.asarray(rng.randn(128), jnp.float32)
    y = w8a8_matmul(x, qw, wscale, bias=bias, interpret=True)
    assert y.shape == (2, 32, 128)
    ref = np.asarray(x) @ (np.asarray(qw, np.float32) * np.asarray(wscale)[None, :]) + np.asarray(bias)
    np.testing.assert_allclose(np.asarray(y), ref, atol=0.02 * np.abs(ref).max())


def test_w8a8_fallback_unaligned_n():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 256), jnp.float32)
    qw, wscale = _make_qw(rng, 256, 100)  # N not a multiple of 128 → dequant fallback
    y = w8a8_matmul(x, qw, wscale)
    ref = np.asarray(x) @ (np.asarray(qw, np.float32) * np.asarray(wscale)[None, :])
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


def test_quantize_rows_roundtrip():
    x = jnp.asarray(np.random.RandomState(3).randn(16, 64), jnp.float32)
    qx, scale = quantize_rows(x)
    assert qx.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(qx, np.float32) * np.asarray(scale), np.asarray(x), atol=np.abs(x).max() / 100)


def test_int8_dynamic_act_config_through_linear():
    rng = np.random.RandomState(4)
    # K must clear the measured-win shape gate (quantize.py: K>=2560)
    lin = Linear(2560, 128)
    params = lin.init(jax.random.PRNGKey(0))
    qparams = quantize_params({"lin": params}, Int8DynamicActConfig(min_weight_size=1))["lin"]
    assert qparams["kernel"].dtype == jnp.int8
    assert "kernel_scale_w8a8" in qparams
    x = jnp.asarray(rng.randn(64, 2560), jnp.float32)
    y = lin(qparams, x)
    ref = lin(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=0.03 * float(jnp.abs(ref).max()))


def test_int8_dynamic_act_below_gate_left_unquantized():
    lin = Linear(256, 128)
    params = lin.init(jax.random.PRNGKey(0))
    qparams = quantize_params({"lin": params}, Int8DynamicActConfig(min_weight_size=1))["lin"]
    assert qparams["kernel"].dtype != jnp.int8  # below the shape gate: untouched


def test_int8_dynamic_act_xla_impl_through_linear():
    rng = np.random.RandomState(5)
    lin = Linear(2560, 128)
    params = lin.init(jax.random.PRNGKey(0))
    cfg = Int8DynamicActConfig(min_weight_size=1, impl="xla")
    qparams = quantize_params({"lin": params}, cfg)["lin"]
    assert qparams["kernel"].dtype == jnp.int8
    assert "kernel_scale_i8x" in qparams
    x = jnp.asarray(rng.randn(64, 2560), jnp.float32)
    y = lin(qparams, x)
    ref = lin(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=0.03 * float(jnp.abs(ref).max()))
