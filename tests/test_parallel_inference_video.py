"""Sharded video-pipeline inference (VERDICT r2 #3): Wan and LTX run
TP+SP-sharded over the 8-virtual-device mesh via `enable_parallelism` with the
new GENERIC_DIT_TP_PLAN and match single-device output."""

import jax
import numpy as np
import pytest

from diffusers_tpu.parallel.mesh import ParallelConfig


def _run_wan(pipe):
    return np.asarray(pipe(
        "a robot dancing", height=16, width=16, num_frames=5, num_inference_steps=2,
        guidance_scale=5.0, key=jax.random.PRNGKey(0), output_type="np",
    ).frames)


def _run_ltx(pipe):
    return np.asarray(pipe(
        "a river of stars", height=32, width=32, num_frames=9, num_inference_steps=2,
        guidance_scale=3.0, key=jax.random.PRNGKey(1), output_type="np",
    ).frames)


@pytest.mark.parametrize("cp_backend", ["ulysses", "ring"])
def test_wan_sharded_matches_single_device(cp_backend):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from tests.test_pipeline_wan import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    ref = _run_wan(pipe)
    mesh = pipe.enable_parallelism(
        ParallelConfig(data_degree=2, tensor_degree=2, sequence_degree=2),
        cp_backend=cp_backend,
    )
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 2, "tensor": 2, "sequence": 2}
    out = _run_wan(pipe)
    pipe.disable_parallelism()
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("cp_backend", ["ulysses", "ring"])
def test_ltx_sharded_matches_single_device(cp_backend):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from tests.test_pipeline_ltx import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    ref = _run_ltx(pipe)
    pipe.enable_parallelism(
        ParallelConfig(data_degree=2, tensor_degree=2, sequence_degree=2),
        cp_backend=cp_backend,
    )
    out = _run_ltx(pipe)
    pipe.disable_parallelism()
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)


def test_replicate_fallback_warns(caplog):
    """A big plan-less component must warn under tensor parallelism."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import logging as _logging

    import diffusers_tpu.pipelines.pipeline_utils as pu
    from diffusers_tpu.parallel import plans
    from tests.test_pipeline_wan import get_dummy_pipeline

    pipe = get_dummy_pipeline()
    saved_plans = dict(plans.MODEL_TP_PLANS)
    saved_thresh = pu._TP_REPLICATE_WARN_PARAMS
    try:
        plans.MODEL_TP_PLANS.clear()  # force every component down the plan-less path
        pu._TP_REPLICATE_WARN_PARAMS = 0
        root = _logging.getLogger("diffusers_tpu")
        was_propagate = root.propagate
        root.propagate = True  # the library logger doesn't propagate by default
        try:
            with caplog.at_level(_logging.WARNING):
                pipe.enable_parallelism(ParallelConfig(data_degree=2, tensor_degree=2, sequence_degree=2))
        finally:
            root.propagate = was_propagate
        pipe.disable_parallelism()
        assert any("REPLICATED" in r.message for r in caplog.records)
    finally:
        plans.MODEL_TP_PLANS.update(saved_plans)
        pu._TP_REPLICATE_WARN_PARAMS = saved_thresh
