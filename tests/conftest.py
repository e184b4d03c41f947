"""Test harness config: force an 8-device virtual CPU mesh.

Tests exercise multi-chip sharding logic without TPU hardware; the
driver separately dry-run-compiles the multi-chip path and benchmarks
on a real chip.  Must run before jax initializes its backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
