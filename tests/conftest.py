"""Test env: CPU platform with 8 virtual devices so mesh/sharding code paths
run without TPU hardware (SURVEY.md §4).  Must run before jax import."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
