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

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (2-process multihost jobs, heavy "
        "blocked-SPMD trajectory checks); excluded from the default "
        "gate — set RUN_SLOW=1 (or -m slow) for the CI-style full run",
    )


def pytest_collection_modifyitems(config, items):
    """Default gate stays fast (~15 min); slow tests still run in full
    CI-style sweeps with RUN_SLOW=1 or an explicit -m selection."""
    if os.environ.get("RUN_SLOW") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(
        reason="slow test: set RUN_SLOW=1 (or -m slow) to include"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
