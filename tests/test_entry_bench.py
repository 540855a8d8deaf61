"""Smoke tests for the driver entry points on the 8-virtual-device CPU mesh."""
import jax
import numpy as np


def test_entry_compiles_and_runs():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    val = jax.jit(fn)(*args)
    assert np.isfinite(float(val))


def test_dryrun_multichip_8():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
