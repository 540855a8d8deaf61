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


# Curated `-m core` tier: ~20 tests, < 5 min on the 1-core box — one honest
# signal per subsystem (foundation, KF dense oracle, variant fuzz smoke, CVI,
# sqrt, physics, sharding) between the 45-s 2-file smoke and the 33-min quick
# tier. Keep this list SMALL; it is a gate, not coverage.
CORE_NODE_IDS = frozenset({
    # parameter system / modules / bijectors
    "tests/test_foundation.py",  # whole file (13 fast tests)
    # KF == dense GP oracle + jit/grad plumbing
    "tests/test_kalman.py::test_kf_lml_matches_dense_gp[False-Matern32]",
    "tests/test_kalman.py::test_kf_lml_matches_dense_gp[True-Matern32]",
    "tests/test_kalman.py::test_posterior_matches_dense_gp[True]",
    "tests/test_kalman.py::test_missing_data_equals_dropped_data",
    "tests/test_kalman.py::test_jit_and_grad_through_model_pytree",
    # filter-variant fuzz smoke (cov+sqrt, seed 0)
    "tests/test_fuzz_kalman.py::test_variants_match_sequential_oracle"
    "[False-0-40-1-1-False-None]",
    "tests/test_fuzz_kalman.py::test_variants_match_sequential_oracle"
    "[True-0-40-1-1-False-None]",
    # CVI conjugate-site inference
    "tests/test_cvi.py::test_gaussian_cvi_one_step_exact",
    "tests/test_cvi.py::test_elbo_monotone_poisson[False]",
    # QR square-root path
    "tests/test_sqrt_kalman.py::test_sqrt_blocked_schedule_matches_sequential",
    # one physics gate (exact conjugate ODE head vs truth)
    "tests/test_physics.py::test_ode_gp_damped_oscillator[False]",
    # sharding smoke on the 8-virtual-device mesh
    "tests/test_sharded.py::test_sharded_equals_single_device[8-8]",
    "tests/test_sharded.py::test_cvi_step_with_mesh_matches_local",
    # AOT export round trip (deserialize + execute; rots silently otherwise)
    "tests/test_serving.py::test_export_predict_roundtrip",
})


def pytest_collection_modifyitems(config, items):
    """Every test not marked `slow` is `quick`, so `-m quick` runs a fast
    smoke tier and `-m slow` the multi-minute gates; no marker runs all.
    `-m core` is the curated <5-min cross-subsystem gate (CORE_NODE_IDS)."""
    import pytest

    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)
        if (item.nodeid in CORE_NODE_IDS
                or item.nodeid.split("::")[0] in CORE_NODE_IDS):
            item.add_marker(pytest.mark.core)
