"""Test config: CPU backend with 8 virtual devices (SURVEY §4(g)) and x64.

Multi-chip sharding tests run on a simulated 8-device CPU mesh via
--xla_force_host_platform_device_count, mirroring how the driver validates
the multi-chip path without real TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
