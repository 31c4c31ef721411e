"""Pallas flash attention vs native einsum attention (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.ops.attention import dispatch_attention_fn
from diffusers_tpu.ops.pallas.flash_attention import flash_attention


def _qkv(b=2, s=512, h=4, d=128, dtype=jnp.float32, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (b, s, h, d), dtype=dtype)
    k = jax.random.normal(k2, (b, s, h, d), dtype=dtype)
    v = jax.random.normal(k3, (b, s, h, d), dtype=dtype)
    return q, k, v


def test_flash_matches_native():
    q, k, v = _qkv()
    ref = dispatch_attention_fn(q, k, v, backend="native")
    out = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_causal_matches_native():
    q, k, v = _qkv(s=256)
    ref = dispatch_attention_fn(q, k, v, backend="native", is_causal=True)
    out = flash_attention(q, k, v, is_causal=True, interpret=True, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_custom_scale():
    q, k, v = _qkv(s=256)
    ref = dispatch_attention_fn(q, k, v, backend="native", scale=0.5)
    out = flash_attention(q, k, v, scale=0.5, interpret=True, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_fallback_on_unaligned_shapes():
    # d=64 not lane-aligned -> silently uses native path, still correct
    q, k, v = _qkv(s=77, d=64)
    ref = dispatch_attention_fn(q, k, v, backend="native")
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_bf16():
    q, k, v = _qkv(s=256, dtype=jnp.bfloat16)
    ref = dispatch_attention_fn(q, k, v, backend="native")
    out = flash_attention(q, k, v, interpret=True, block_q=128, block_k=128)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32), atol=2e-2, rtol=2e-2
    )
