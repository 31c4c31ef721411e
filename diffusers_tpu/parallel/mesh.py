"""Device mesh construction for multi-chip execution.

TPU-native replacement for the reference's parallelism bootstrap
(`/root/reference/src/diffusers/models/_modeling_parallel.py:42`
ContextParallelConfig/ParallelConfig + `modeling_utils.py:1601`
enable_parallelism): instead of torch.distributed process groups + NCCL, we
build one `jax.sharding.Mesh` whose axes express every parallelism degree:

  * ``data``      — data parallel (and CFG-parallel: cond/uncond as batch shard)
  * ``tensor``    — tensor parallel (attention heads / MLP width)
  * ``sequence``  — sequence/context parallel (the reference's ring×ulysses
                    submesh collapses to one sharded token axis under GSPMD;
                    XLA inserts the all-gathers/all-to-alls the reference
                    hand-writes in attention_dispatch.py:2229-2740)

On multi-host systems the data axis should map to DCN and
tensor/sequence to ICI, which `jax.experimental.mesh_utils` handles via
create_hybrid_device_mesh.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TENSOR_AXIS = "tensor"
SEQUENCE_AXIS = "sequence"
DEFAULT_AXES = (DATA_AXIS, TENSOR_AXIS, SEQUENCE_AXIS)


@dataclass
class ParallelConfig:
    """Degrees for each parallelism axis; mirrors the reference's
    ParallelConfig surface (`_modeling_parallel.py:158`) with TPU semantics.
    ring_degree × ulysses_degree from the reference collapse into
    ``sequence_degree`` (GSPMD plans the collective pattern)."""

    data_degree: int = 1
    tensor_degree: int = 1
    sequence_degree: int = 1

    # reference-compat aliases
    @classmethod
    def from_cp(cls, ring_degree: int = 1, ulysses_degree: int = 1, **kwargs):
        return cls(sequence_degree=ring_degree * ulysses_degree, **kwargs)

    @property
    def world_size(self) -> int:
        return self.data_degree * self.tensor_degree * self.sequence_degree


def create_mesh(
    config: Optional[ParallelConfig] = None,
    devices: Optional[Sequence] = None,
    axis_names: Tuple[str, ...] = DEFAULT_AXES,
) -> Mesh:
    """Build a Mesh; with no config, all devices go to the data axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if config is None:
        config = ParallelConfig(data_degree=n)
    if config.world_size != n:
        raise ValueError(f"ParallelConfig degrees {config} do not multiply to device count {n}")
    shape = (config.data_degree, config.tensor_degree, config.sequence_degree)
    device_array = np.asarray(devices).reshape(shape)
    return Mesh(device_array, axis_names)


def initialize_multi_host(coordinator_address: Optional[str] = None,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None) -> int:
    """Multi-host bootstrap: `jax.distributed.initialize` (the TPU-native
    analogue of the reference's NCCL/torch.distributed process-group init,
    SURVEY §2.9 comm-backend row). On Cloud TPU pods all arguments are
    auto-detected from the metadata server; on other clusters pass them
    explicitly (or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID). Returns the number of processes. Idempotent."""
    if jax.process_count() > 1 or getattr(jax.distributed, "_initialized", False):
        return jax.process_count()
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:  # single-process / already initialized
        if num_processes not in (None, 1):
            raise
        from ..utils import logging as _logging

        _logging.get_logger(__name__).debug(f"jax.distributed.initialize skipped: {e}")
    return jax.process_count()


def create_hybrid_mesh(config: ParallelConfig, axis_names: Tuple[str, ...] = DEFAULT_AXES) -> Mesh:
    """Multi-host mesh: the data axis rides DCN (across hosts), tensor and
    sequence ride ICI (within a host's chips) — the layout the scaling
    playbook prescribes and the reference approximates with NCCL process
    groups. Uses `mesh_utils.create_hybrid_device_mesh` when more than one
    process is attached; degenerates to `create_mesh` single-host."""
    if jax.process_count() <= 1:
        return create_mesh(config)
    from jax.experimental import mesh_utils

    per_host = (1, config.tensor_degree, config.sequence_degree)
    dcn = (config.data_degree, 1, 1)
    dev_array = mesh_utils.create_hybrid_device_mesh(
        per_host, dcn_mesh_shape=dcn, devices=jax.devices())
    return Mesh(dev_array, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Batch-leading activations: shard batch over data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_tokens(mesh: Mesh) -> NamedSharding:
    """[B, S, D] activations: batch over data, tokens over sequence."""
    return NamedSharding(mesh, P(DATA_AXIS, SEQUENCE_AXIS, None))
