"""Ambient parallel environment.

The TPU-native analogue of the reference's `_parallel_config` injection
(`/root/reference/src/diffusers/models/modeling_utils.py:1672-1678` copies the
ParallelConfig into every attention processor so `dispatch_attention_fn`
routes into the templated Ring/Ulysses functions). Here the same information —
which mesh is active and which sequence-parallel strategy to use — lives in
one process-level context that `ops.attention.dispatch_attention_fn` consults
at trace time. `DiffusionPipeline.enable_parallelism` installs it and wraps
its jitted callables so the env is active for the duration of each traced
call.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from jax.sharding import Mesh

from .mesh import DATA_AXIS, SEQUENCE_AXIS, TENSOR_AXIS, ParallelConfig


@dataclass(frozen=True)
class ParallelEnv:
    """Active mesh + strategy for sharded execution.

    cp_backend: "ulysses" | "ring" | None — preferred sequence-parallel
    attention strategy; None auto-selects per call (ulysses when heads divide
    evenly over the sequence axis, else ring).
    """

    mesh: Mesh
    config: ParallelConfig
    cp_backend: Optional[str] = None

    @property
    def data_axis(self) -> str:
        return DATA_AXIS

    @property
    def tensor_axis(self) -> str:
        return TENSOR_AXIS

    @property
    def sequence_axis(self) -> str:
        return SEQUENCE_AXIS

    @property
    def sequence_degree(self) -> int:
        return self.config.sequence_degree


_ACTIVE_ENV: Optional[ParallelEnv] = None


def get_parallel_env() -> Optional[ParallelEnv]:
    return _ACTIVE_ENV


def set_parallel_env(env: Optional[ParallelEnv]) -> Optional[ParallelEnv]:
    """Install (or clear, with None) the ambient env; returns the previous one."""
    global _ACTIVE_ENV
    prev = _ACTIVE_ENV
    _ACTIVE_ENV = env
    return prev


class parallel_env:
    """Context manager scoping an ambient env around a traced call."""

    def __init__(self, env: Optional[ParallelEnv]):
        self.env = env
        self._prev = None

    def __enter__(self):
        self._prev = set_parallel_env(self.env)
        return self.env

    def __exit__(self, *exc):
        set_parallel_env(self._prev)
        return False
