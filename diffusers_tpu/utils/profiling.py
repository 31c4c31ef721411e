"""Profiling & benchmarking harness.

TPU counterpart of the reference's `benchmarks/benchmarking_utils.py:24`
(`benchmark_fn` Timer wrapper + flop counting) and
`examples/profiling/profiling_pipelines.py` (torch.profiler driver): here a
`jax.profiler` trace context (Perfetto/TensorBoard-viewable) plus a
latency/throughput measurement helper that is correct under the axon tunnel,
where `block_until_ready()` does not fence device completion — only a scalar
readback does.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from . import logging

logger = logging.get_logger(__name__)


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace viewable in TensorBoard/Perfetto.

    Example::

        with profiling.trace("/tmp/jax-trace"):
            pipe(prompt, num_inference_steps=4)
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profile trace written to %s", log_dir)


def _fence(out: Any) -> None:
    """Force device completion. A scalar readback is the only reliable fence
    through the axon tunnel (block_until_ready returns early there)."""
    leaf = jax.tree_util.tree_leaves(out)
    if leaf:
        arr = leaf[0]
        if hasattr(arr, "astype"):
            float(jnp.sum(arr.astype(jnp.float32)))


def benchmark_fn(
    fn: Callable,
    *args,
    iters: int = 10,
    warmup: int = 2,
    flops: Optional[float] = None,
    **kwargs,
) -> Dict[str, float]:
    """Time a jitted callable: per-call mean/median/min latency in ms.

    Queues `iters` calls then fences once (steady-state throughput timing, the
    same protocol as bench.py); additionally measures a single fenced call for
    tail latency. If `flops` (per call) is given, reports achieved TFLOP/s.
    """
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    _fence(out)

    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    _fence(out)
    mean_s = (time.perf_counter() - start) / iters

    singles = []
    for _ in range(min(iters, 5)):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        _fence(out)
        singles.append(time.perf_counter() - t0)

    result = {
        "mean_ms": mean_s * 1e3,
        "single_median_ms": statistics.median(singles) * 1e3,
        "single_min_ms": min(singles) * 1e3,
        "iters": float(iters),
    }
    if flops is not None:
        result["tflops_per_sec"] = flops / mean_s / 1e12
    return result


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM stats (bytes) where the backend exposes them."""
    stats = {}
    for d in jax.devices():
        try:
            m = d.memory_stats()
        except Exception:
            continue
        if m:
            stats[str(d.id)] = {
                "bytes_in_use": m.get("bytes_in_use", 0),
                "peak_bytes_in_use": m.get("peak_bytes_in_use", 0),
                "bytes_limit": m.get("bytes_limit", 0),
            }
    return stats
