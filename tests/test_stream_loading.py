"""Streaming checkpoint load (per-tensor convert → quantize → sharded
device_put) + sharded save_pretrained round-trip.

Reference equivalents: meta-device init + per-shard placement
(`models/model_loading_utils.py:213,391`), sharded save with index emission
(`models/modeling_utils.py:673-866`)."""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from diffusers_tpu.models.unets.unet_2d_condition import UNet2DConditionModel

TINY = dict(
    sample_size=8, in_channels=4, out_channels=4,
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(8, 16), layers_per_block=1, attention_head_dim=(2, 4),
    cross_attention_dim=16, norm_num_groups=4,
)


def _make_and_save(tmpdir, **save_kwargs):
    model = UNet2DConditionModel(**TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    model.save_pretrained(tmpdir, params, **save_kwargs)
    return model, params


def test_sharded_save_and_stream_load_roundtrip(tmp_path):
    d = str(tmp_path / "m")
    model, params = _make_and_save(d, max_shard_size=200 * 1024)  # force shards

    shard_files = glob.glob(os.path.join(d, "diffusion_pytorch_model-*-of-*.safetensors"))
    assert len(shard_files) > 1, "expected a sharded checkpoint"
    with open(os.path.join(d, "diffusion_pytorch_model.safetensors.index.json")) as f:
        index = json.load(f)
    assert set(index["weight_map"].values()) == {os.path.basename(p) for p in shard_files}
    assert index["metadata"]["total_size"] > 0

    model2, params2 = UNet2DConditionModel.from_pretrained(d)
    flat = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(params2)
    assert len(flat) == len(flat2)
    for a, b in zip(flat, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_stream_load_dtype_cast(tmp_path):
    d = str(tmp_path / "m")
    _make_and_save(d)
    _, params = UNet2DConditionModel.from_pretrained(d, dtype=jnp.bfloat16)
    dtypes = {x.dtype for x in jax.tree.leaves(params)}
    assert dtypes == {jnp.dtype(jnp.bfloat16)}


def test_stream_load_quantized_matches_tree_quantize(tmp_path):
    """Host per-tensor quantize must equal the whole-tree jitted quantizer."""
    from diffusers_tpu.quantizers.quantization_config import Int8WeightOnlyConfig
    from diffusers_tpu.quantizers.quantize import quantize_params

    d = str(tmp_path / "m")
    model, params = _make_and_save(d)
    qc = Int8WeightOnlyConfig(min_weight_size=0)
    _, qparams = UNet2DConditionModel.from_pretrained(d, quantization_config=qc)
    ref = quantize_params(params, qc)

    paths_q = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_flatten_with_path(qparams)[0]}
    paths_r = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_flatten_with_path(ref)[0]}
    assert set(paths_q) == set(paths_r)
    n_int8 = 0
    for k in paths_q:
        a, b = np.asarray(paths_q[k]), np.asarray(paths_r[k])
        assert a.dtype == b.dtype, (k, a.dtype, b.dtype)
        if a.dtype == np.int8:
            n_int8 += 1
            # int8 codes may differ by 1 ulp from rounding-order differences
            assert np.mean(np.abs(a.astype(np.int32) - b.astype(np.int32))) < 0.01, k
        else:
            np.testing.assert_allclose(a, b, rtol=2e-7, atol=1e-7)
    assert n_int8 > 0, "no kernels were quantized"


def test_stream_load_onto_mesh(tmp_path):
    """mesh= places every leaf with its planned sharding at load time — no
    single-device staging (the dp/tp 'enable_parallelism at load' path)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    d = str(tmp_path / "m")
    model, params = _make_and_save(d)

    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "tensor"))
    plan = [(r".*to_q\.kernel", P(None, "tensor")), (r".*to_k\.kernel", P(None, "tensor"))]
    _, sparams = UNet2DConditionModel.from_pretrained(d, mesh=mesh, tp_plan=plan)

    flat = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_flatten_with_path(sparams)[0]}
    sharded = [k for k, v in flat.items() if "to_q" in k and k.endswith("['kernel']")]
    assert sharded
    for k in sharded:
        s = flat[k].sharding
        assert isinstance(s, NamedSharding) and s.spec == P(None, "tensor"), (k, s)
    # everything else replicated on the mesh
    other = next(k for k in flat if "to_q" not in k and "to_k" not in k)
    assert flat[other].sharding.spec == P()
    # values survive sharding
    ref = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    for k in list(flat)[:10]:
        np.testing.assert_allclose(np.asarray(flat[k]), np.asarray(ref[k]), atol=1e-7)
