"""Test harness config: run on CPU with an 8-device virtual mesh.

Oracle-fidelity and sharding tests run on the CPU backend (the real
TPU chip is reserved for bench.py and device smoke tests).  The
environment may force-register a TPU tunnel plugin at interpreter
start, so the backend choice must be made via jax.config, which wins
over any plugin registration, before the first backend use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
