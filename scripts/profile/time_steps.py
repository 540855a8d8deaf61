"""Time the config-5 full CVI step, covariance and sqrt forms, on the TPU.

Measured as an ON-DEVICE K-step lax.scan loop per dispatch (single-dispatch
timings carry the ~8 ms relay floor; only in-graph time is real — CLAUDE.md
rule 8), chained with a host float() sync at the end.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile/time_steps.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

from physs_gp_tpu.trainers import natgrad_scan
from physs_gp_tpu.utils.struct import replace
from physs_gp_tpu.zoo.bench_configs import build_config5

T5 = 100_000
CHUNK = 20_000
K = 3


def time_step(m, reps=2):
    step = jax.jit(
        lambda mm: natgrad_scan(mm, 0.5, n_steps=K, nan_guard=False)[0]
    )
    m2 = step(m)
    _ = float(m2.sites.Y[0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        m2 = step(m2)
    _ = float(m2.sites.Y[0, 0])
    dt = (time.perf_counter() - t0) / (reps * K)
    elbo = float(jax.jit(lambda mm: mm.elbo())(m2))
    return dt, elbo


def main():
    m = build_config5(T5, CHUNK)
    dt, e = time_step(m)
    print(f"cov  step {dt*1e3:8.1f} ms  ({T5/dt:9.1f} steps/s)  elbo {e:.6e}",
          flush=True)
    ms = replace(m, sqrt=True)
    dts, es = time_step(ms)
    print(f"sqrt step {dts*1e3:8.1f} ms  ({T5/dts:9.1f} steps/s)  elbo {es:.6e}",
          flush=True)
    print(f"sqrt/cov tax: {dts/dt:.2f}x")


if __name__ == "__main__":
    main()
