"""Test configuration: run on CPU in float64 with 8 virtual devices.

Accuracy gates (KF lml == dense GP lml to 1e-8 etc., SURVEY.md §4) need fp64;
the 8 virtual CPU devices let sharding tests exercise a real
`jax.sharding.Mesh` without TPU hardware.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# jax is already imported by the machine's sitecustomize (TPU plugin), so the
# env vars above may be read too late; the config update takes effect as long
# as no backend has been initialised yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_collection_modifyitems(config, items):
    """Every test not marked `slow` is `quick`, so `-m quick` runs a fast
    smoke tier and `-m slow` the multi-minute gates; no marker runs all."""
    import pytest

    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)
