"""Sweep blocked-scan width (PHYSS_SCAN_BLOCKS) x chunk size on the config-5
step, under the now-default blocked inner scans.

Run: PYTHONPATH=/root/repo python -u scripts/profile/profile_c5e.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import T5, build_config5
from physs_gp_tpu.utils.struct import replace


def chain(m, c):
    return replace(
        m, sites=replace(m.sites, V=m.sites.V + jnp.asarray(1e-30, m.t.dtype) * c)
    )


def timeit(f, m, reps=5):
    f = jax.jit(f)
    c = float(f(m, jnp.asarray(0.0, m.t.dtype)))
    t0 = time.perf_counter()
    cc = jnp.asarray(c, m.t.dtype) * 1e-30
    for _ in range(reps):
        cc = f(m, cc) * 1e-30
    _ = float(cc)
    return (time.perf_counter() - t0) / reps


def main():
    for chunk in (20_000, 40_000):
        m = build_config5(T5, chunk)
        for nb in (512, 256):
            os.environ["PHYSS_SCAN_BLOCKS"] = str(nb)

            def p_step(mm, c, _k=(chunk, nb)):
                m2, e = chain(mm, c).step_with_elbo(0.5)
                return e + m2.sites.V.sum() * 1e-30

            t = timeit(p_step, m)
            print(f"chunk={chunk:<6d} blocks={nb:<5d} {t*1e3:9.2f} ms  "
                  f"({T5/t:,.0f} steps/s)", flush=True)
    os.environ.pop("PHYSS_SCAN_BLOCKS", None)
    sqrt_probe()


def sqrt_probe():
    """Config-5 sqrt-path step after the _solve_tri GJ routing."""
    import importlib
    m = build_config5(T5, 10_000)
    m = replace(m, sqrt=True)

    def p_step(mm, c):
        m2, e = chain(mm, c).step_with_elbo(0.5)
        return e + m2.sites.V.sum() * 1e-30

    t = timeit(p_step, m)
    print(f"sqrt step chunk=10000  {t*1e3:9.2f} ms  ({T5/t:,.0f} steps/s)",
          flush=True)


if __name__ == "__main__":
    main()
