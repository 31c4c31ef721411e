"""Claim→evidence for TextKVCacheConfig's no-op-by-construction rationale.

`hooks/generic_cache.py` accepts ``TextKVCacheConfig`` as a no-op inside
`denoise_scan` on the grounds that XLA's loop-invariant code motion hoists
the text-conditioned K/V projections out of the scanned denoise loop — the
exact computation the reference's text-KV hook caches
(`/root/reference/src/diffusers/hooks/text_kv_cache.py`). This test MEASURES
that: compiled FLOPs of a scan whose body recomputes the text K/V projection
must match (within 2%) a variant where the projection is manually hoisted.
If XLA ever stops hoisting, the FLOP gap (30 steps x 2 projections) blows the
tolerance and this test fails — the signal to drop the config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _flops(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # older jax returns [dict]
        analysis = analysis[0]
    if not analysis or "flops" not in analysis:
        pytest.skip("cost_analysis unavailable on this backend")
    return float(analysis["flops"])


def test_text_kv_projection_is_hoisted_out_of_scan():
    steps = 30
    d_model, d_txt, seq_q, seq_kv = 128, 256, 64, 77
    rng = np.random.RandomState(0)
    wk = jnp.asarray(rng.randn(d_txt, d_model).astype(np.float32))
    wv = jnp.asarray(rng.randn(d_txt, d_model).astype(np.float32))
    ehs = jnp.asarray(rng.randn(1, seq_kv, d_txt).astype(np.float32))
    lat0 = jnp.asarray(rng.randn(1, seq_q, d_model).astype(np.float32))

    def attend(lat, k, v):
        a = jax.nn.softmax(jnp.einsum("bqd,bkd->bqk", lat, k) / np.sqrt(d_model), axis=-1)
        return lat + jnp.einsum("bqk,bkd->bqd", a, v)

    def loop_inner_kv(lat, ehs):
        def body(lat, _):
            # text K/V projections INSIDE the loop body (what every scanned
            # pipeline in this repo writes) — loop-invariant w.r.t. the carry
            k, v = ehs @ wk, ehs @ wv
            return attend(lat, k, v) * 0.99, None

        lat, _ = jax.lax.scan(body, lat, None, length=steps)
        return lat

    def loop_hoisted_kv(lat, ehs):
        k, v = ehs @ wk, ehs @ wv  # manually hoisted (what the reference's hook caches)

        def body(lat, _):
            return attend(lat, k, v) * 0.99, None

        lat, _ = jax.lax.scan(body, lat, None, length=steps)
        return lat

    np.testing.assert_allclose(
        np.asarray(loop_inner_kv(lat0, ehs)), np.asarray(loop_hoisted_kv(lat0, ehs)), atol=1e-5
    )
    f_inner = _flops(loop_inner_kv, lat0, ehs)
    f_hoisted = _flops(loop_hoisted_kv, lat0, ehs)
    # un-hoisted would cost (steps-1) extra KV projections ≈ +26% here; demand
    # the compiled graphs agree within 2%
    kv_flops = 2 * 2 * seq_kv * d_txt * d_model
    assert f_inner <= f_hoisted + 0.02 * f_hoisted + kv_flops, (
        f"XLA did not hoist the text-KV projection: {f_inner} vs {f_hoisted} flops "
        f"(unhoisted penalty would be ~{(steps - 1) * kv_flops})"
    )
