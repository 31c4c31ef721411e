"""Multi-host skeleton (VERDICT r2 #9): jax.distributed bootstrap + DCN-aware
hybrid mesh. Real multi-process runs are gated on process_count > 1; here we
verify the single-process degenerate paths and the API surface."""

import jax
import numpy as np
import pytest

from diffusers_tpu.parallel.mesh import (
    ParallelConfig,
    create_hybrid_mesh,
    initialize_multi_host,
)


def test_initialize_multi_host_single_process_noop():
    assert initialize_multi_host() == jax.process_count() == 1


def test_hybrid_mesh_degenerates_to_single_host():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_hybrid_mesh(ParallelConfig(data_degree=2, tensor_degree=2, sequence_degree=2))
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 2, "tensor": 2, "sequence": 2}


@pytest.mark.skipif(jax.process_count() <= 1, reason="needs a multi-process jax.distributed run")
def test_hybrid_mesh_multi_process():
    cfg = ParallelConfig(data_degree=jax.process_count(),
                         tensor_degree=len(jax.local_devices()), sequence_degree=1)
    mesh = create_hybrid_mesh(cfg)
    assert mesh.devices.shape[0] == jax.process_count()
