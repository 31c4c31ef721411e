"""Pallas fused GroupNorm+SiLU kernel correctness (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusers_tpu.ops.module import GroupNorm
from diffusers_tpu.ops.pallas.group_norm import group_norm_silu_nhwc


def test_group_norm_silu_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 256), jnp.float32)
    scale = jnp.asarray(rng.randn(256), jnp.float32)
    bias = jnp.asarray(rng.randn(256), jnp.float32)
    out = group_norm_silu_nhwc(x, scale, bias, 32, interpret=True)
    gn = GroupNorm(32, 256)
    ref = jax.nn.silu(gn({"scale": scale, "bias": bias}, x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)


def test_group_norm_no_silu():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 16, 128), jnp.float32)
    scale = jnp.ones(128)
    bias = jnp.zeros(128)
    out = group_norm_silu_nhwc(x, scale, bias, 16, apply_silu=False, interpret=True)
    gn = GroupNorm(16, 128)
    ref = gn({"scale": scale, "bias": bias}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)
