"""Flash attention fwd+bwd kernel (interpret mode): gradient parity vs native
autodiff, mask support, LSE correctness (VERDICT r1 next-step #6; semantics
match `/root/reference/src/diffusers/models/attention_dispatch.py:2246-2356`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusers_tpu.ops.attention import _native_attention
from diffusers_tpu.ops.pallas.flash_attention_bwd import (
    _flash_attention_fwd_impl,
    flash_attention_full,
)


def _qkv(b=1, s=256, h=2, d=64, sk=None, seed=0):
    rng = np.random.RandomState(seed)
    sk = sk or s
    q = jnp.asarray(rng.randn(b, s, h, d), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(b, sk, h, d), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(b, sk, h, d), jnp.float32) * 0.3
    return q, k, v


def test_forward_matches_native():
    q, k, v = _qkv()
    out = flash_attention_full(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = _native_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_with_mask_matches_native():
    q, k, v = _qkv()
    rng = np.random.RandomState(1)
    # additive bias, also exercises broadcast over heads
    mask = jnp.asarray(np.where(rng.rand(1, 1, 256, 256) < 0.3, -1e9, 0.0), jnp.float32)
    out = flash_attention_full(q, k, v, attn_mask=mask, block_q=128, block_k=128, interpret=True)
    ref = _native_attention(q, k, v, attn_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_causal_matches_native():
    q, k, v = _qkv()
    out = flash_attention_full(q, k, v, is_causal=True, block_q=128, block_k=128, interpret=True)
    ref = _native_attention(q, k, v, is_causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_lse_matches_logsumexp():
    q, k, v = _qkv()
    _, lse = _flash_attention_fwd_impl(q, k, v, None, 0.125, False, 128, 128, True)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * 0.125
    ref_lse = jax.scipy.special.logsumexp(logits, axis=-1)  # [B, H, S]
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), atol=1e-4)


@pytest.mark.parametrize("is_causal,with_mask", [(False, False), (True, False), (False, True)])
def test_grad_parity_vs_native_autodiff(is_causal, with_mask):
    q, k, v = _qkv(s=128, d=64)
    mask = None
    if with_mask:
        rng = np.random.RandomState(2)
        mask = jnp.asarray(np.where(rng.rand(1, 2, 128, 128) < 0.2, -1e9, 0.0), jnp.float32)

    def loss_flash(q, k, v):
        out = flash_attention_full(q, k, v, attn_mask=mask, is_causal=is_causal,
                                   block_q=128, block_k=128, interpret=True)
        return jnp.sum(out * jnp.cos(out))

    def loss_native(q, k, v):
        out = _native_attention(q, k, v, attn_mask=mask, is_causal=is_causal)
        return jnp.sum(out * jnp.cos(out))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_native = jax.grad(loss_native, argnums=(0, 1, 2))(q, k, v)
    for gf, gn, name in zip(g_flash, g_native, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gn), atol=5e-4, err_msg=f"d{name}")


def test_grad_cross_attention_rect():
    q, k, v = _qkv(s=256, sk=128, d=64, seed=3)

    def loss(fn):
        def inner(q, k, v):
            return jnp.sum(jnp.tanh(fn(q, k, v)))
        return inner

    flash = loss(lambda q, k, v: flash_attention_full(q, k, v, block_q=128, block_k=128, interpret=True))
    native = loss(lambda q, k, v: _native_attention(q, k, v))
    gf = jax.grad(flash, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(native, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
