"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware (mirrors the reference's spawn-based
multi-accelerator test strategy, `tests/models/testing_utils/parallelism.py`,
re-expressed as a virtual JAX mesh)."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")
