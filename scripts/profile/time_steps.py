"""Time the config-5 full CVI step, covariance and sqrt forms, on the TPU.

Chain-call timing per CLAUDE.md rule 8 (host float() sync each rep chain).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile/time_steps.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import CHUNK, T5, build_config5
from physs_gp_tpu.utils.struct import replace


def time_step(m, reps=5):
    step = jax.jit(lambda mm: mm.step_with_elbo(0.5))
    m2, e = step(m)
    _ = float(e)
    t0 = time.perf_counter()
    for _ in range(reps):
        m2, e = step(m2)
    _ = float(e)
    return (time.perf_counter() - t0) / reps, float(e)


def main():
    m = build_config5(T5, CHUNK)
    dt, e = time_step(m)
    print(f"cov  step {dt*1e3:8.1f} ms  ({T5/dt:9.1f} steps/s)  elbo {e:.6e}",
          flush=True)
    ms = replace(m, sqrt=True)
    dts, es = time_step(ms)
    print(f"sqrt step {dts*1e3:8.1f} ms  ({T5/dts:9.1f} steps/s)  elbo {es:.6e}",
          flush=True)


if __name__ == "__main__":
    main()
