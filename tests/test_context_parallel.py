"""Ring/Ulysses/USP sequence-parallel attention vs single-device ground truth
on the 8-virtual-device CPU mesh (the reference tests CP by spawning
processes and comparing to single-process output,
`tests/models/testing_utils/parallelism.py:44-120` — same oracle here)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from diffusers_tpu.ops.attention import dispatch_attention_fn
from diffusers_tpu.parallel.context_parallel import (
    make_ring_attention,
    make_ulysses_attention,
    unified_sp_attention,
)


def _qkv(b=2, s=64, h=8, d=16):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return (
        jax.random.normal(k1, (b, s, h, d), jnp.float32),
        jax.random.normal(k2, (b, s, h, d), jnp.float32),
        jax.random.normal(k3, (b, s, h, d), jnp.float32),
    )


def _mesh(shape, names):
    devs = np.asarray(jax.devices("cpu")[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def test_ring_attention_matches_full():
    q, k, v = _qkv()
    ref = dispatch_attention_fn(q, k, v, backend="native")
    mesh = _mesh((4,), ("sequence",))
    with mesh:
        out = jax.jit(make_ring_attention(mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_ulysses_attention_matches_full():
    q, k, v = _qkv()
    ref = dispatch_attention_fn(q, k, v, backend="native")
    mesh = _mesh((4,), ("sequence",))
    with mesh:
        out = jax.jit(make_ulysses_attention(mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_unified_sp_matches_full():
    q, k, v = _qkv(s=64, h=8)
    ref = dispatch_attention_fn(q, k, v, backend="native")
    mesh = _mesh((2, 2), ("ring", "ulysses"))
    spec = P(None, ("ring", "ulysses"), None, None)
    fn = shard_map(
        functools.partial(unified_sp_attention, ring_axis="ring", ulysses_axis="ulysses"),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    with mesh:
        out = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# masked / causal CP (round 3): key-validity masks shard with KV; causal via
# ring-topology block masks (reference TemplatedRing/UlyssesAnythingAttention,
# attention_dispatch.py:2460,2573)
# ---------------------------------------------------------------------------


def _run_cp_backend(backend, q, k, v, mesh_size=4, **kw):
    from diffusers_tpu.parallel.env import ParallelEnv, set_parallel_env
    from diffusers_tpu.parallel.mesh import ParallelConfig

    mesh = _mesh((mesh_size,), ("sequence",))
    cfg = ParallelConfig(data_degree=1, tensor_degree=1, sequence_degree=mesh_size)
    env = ParallelEnv(mesh=mesh, config=cfg, cp_backend=backend)
    set_parallel_env(env)
    try:
        with mesh:
            out = dispatch_attention_fn(q, k, v, backend=backend, **kw)
    finally:
        set_parallel_env(None)
    return out


@pytest.mark.parametrize("backend", ["ring", "ulysses"])
def test_cp_key_mask_matches_full(backend):
    q, k, v = _qkv()
    rng = np.random.RandomState(3)
    key_mask = jnp.asarray(rng.rand(2, 64) > 0.3)  # text-padding style
    # ensure at least some valid keys in every shard-worth to exercise merging
    ref = dispatch_attention_fn(q, k, v, attn_mask=key_mask[:, None, None, :], backend="native")
    out = _run_cp_backend(backend, q, k, v, attn_mask=key_mask[:, None, None, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("backend", ["ring", "ulysses"])
def test_cp_fully_masked_shard(backend):
    """A whole KV shard being padding must not produce NaNs."""
    q, k, v = _qkv()
    key_mask = np.ones((2, 64), bool)
    key_mask[:, 48:] = False  # last ring shard entirely invalid
    ref = dispatch_attention_fn(q, k, v, attn_mask=jnp.asarray(key_mask)[:, None, None, :], backend="native")
    out = _run_cp_backend(backend, q, k, v, attn_mask=jnp.asarray(key_mask)[:, None, None, :])
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("backend", ["ring", "ulysses"])
def test_cp_causal_matches_full(backend):
    q, k, v = _qkv()
    ref = dispatch_attention_fn(q, k, v, is_causal=True, backend="native")
    out = _run_cp_backend(backend, q, k, v, is_causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("backend", ["ring", "ulysses"])
def test_cp_causal_plus_key_mask(backend):
    q, k, v = _qkv()
    rng = np.random.RandomState(5)
    key_mask = jnp.asarray(rng.rand(2, 64) > 0.2).at[:, 0].set(True)  # row 0 must see a key
    ref = dispatch_attention_fn(q, k, v, attn_mask=key_mask[:, None, None, :], is_causal=True, backend="native")
    out = _run_cp_backend(backend, q, k, v, attn_mask=key_mask[:, None, None, :], is_causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# uneven shards (round 4): seq % sequence_degree != 0 pads + key-masks +
# trims instead of silently falling back to replicated native (reference
# TemplatedRing/UlyssesAnythingAttention, attention_dispatch.py:2460,2573)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("backend", ["ring", "ulysses"])
def test_cp_uneven_seq_pads_and_matches(backend):
    q, k, v = _qkv(s=70)  # 70 % 4 != 0
    ref = dispatch_attention_fn(q, k, v, backend="native")
    out = _run_cp_backend(backend, q, k, v)
    assert out.shape == q.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("backend", ["ring", "ulysses"])
def test_cp_uneven_seq_with_key_mask(backend):
    q, k, v = _qkv(s=70)
    rng = np.random.RandomState(9)
    key_mask = jnp.asarray(rng.rand(2, 70) > 0.3).at[:, 0].set(True)
    ref = dispatch_attention_fn(q, k, v, attn_mask=key_mask[:, None, None, :], backend="native")
    out = _run_cp_backend(backend, q, k, v, attn_mask=key_mask[:, None, None, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("backend", ["ring"])
def test_cp_uneven_seq_causal(backend):
    q, k, v = _qkv(s=70)
    ref = dispatch_attention_fn(q, k, v, is_causal=True, backend="native")
    out = _run_cp_backend(backend, q, k, v, is_causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
