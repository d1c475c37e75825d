"""Test env: force the CPU platform with 8 virtual devices so the suite is
fast and mesh/sharding code paths run without TPU hardware (SURVEY.md §4).

The environment tunnels a TPU via the 'axon' PJRT plugin, whose sitecustomize
calls ``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start
— overriding JAX_PLATFORMS.  We override back to plain CPU before any backend
is instantiated.  Set GWA_TEST_TPU=1 to run the suite on the real chip.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

if not os.environ.get("GWA_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
