"""Smoke tests for the driver entry points on the 8-virtual-device CPU mesh."""
import jax
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    val = jax.jit(fn)(*args)
    assert np.isfinite(float(val))


@pytest.mark.slow
def test_dryrun_multichip_8():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_bench_builders_cpu_smoke():
    """The driver's bench.py builders must stay importable and runnable on
    CPU (the CPU-baseline subprocess depends on them)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_config5, build_temporal

    m5 = build_config5(64, None, parallel=False, dtype=jnp.float64)
    _, e5 = jax.jit(lambda m: m.step_with_elbo(0.5))(m5)
    assert np.isfinite(float(e5))
    mt = build_temporal(64, None, parallel=False, dtype=jnp.float64)
    _, et = jax.jit(lambda m: m.step_with_elbo(0.5))(mt)
    assert np.isfinite(float(et))
