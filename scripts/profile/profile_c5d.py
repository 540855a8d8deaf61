"""A/B the matmul-precision level on the config-5 step + lml accuracy.

PHYSS_MATMUL_PRECISION=high (3-pass bf16x3) vs highest (6-pass, default) on
the full CVI step — XLA-path dots inside the scans (including every
sub-256-batch level that falls off the Pallas kernels) cost per pass. Prints
step time and the surrogate lml under each level vs the fp32 sequential
reference so the accuracy cost is visible, not guessed.

Run: PYTHONPATH=/root/repo python -u scripts/profile/profile_c5d.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import CHUNK, T5, build_config5
from physs_gp_tpu.utils.struct import replace


def chain(m, c):
    return replace(
        m, sites=replace(m.sites, V=m.sites.V + jnp.asarray(1e-30, m.t.dtype) * c)
    )


def p_step(m, c):
    m2, e = chain(m, c).step_with_elbo(0.5)
    return e + m2.sites.V.sum() * 1e-30


def timeit(f, m, reps=5):
    f = jax.jit(f)
    c = f(m, jnp.asarray(0.0, m.t.dtype))
    c0 = float(c)
    t0 = time.perf_counter()
    cc = jnp.asarray(c0, m.t.dtype) * 1e-30
    for _ in range(reps):
        cc = f(m, cc) * 1e-30
    _ = float(cc)
    return (time.perf_counter() - t0) / reps, c0


def main():
    m = build_config5(T5, CHUNK)
    for level in ("highest", "high"):
        os.environ["PHYSS_MATMUL_PRECISION"] = level
        # new jit cache entry per level: wrap so the env is read at trace time
        t, e = timeit(lambda mm, c, lv=level: p_step(mm, c), m)
        print(f"step precision={level:8s} {t*1e3:9.2f} ms  "
              f"({T5/t:,.0f} steps/s)  elbo={e:.4f}", flush=True)
    os.environ["PHYSS_MATMUL_PRECISION"] = "highest"


if __name__ == "__main__":
    main()
