"""Temporal workload (d=2 Matern-3/2 Poisson CVI) schedule/chunk sweep.

Hypothesis (round 4): at d=2 every combine runs CLOSED-FORM XLA (the Pallas
lane-batched linalg gates on 3 <= d), so the blocked schedule's motivation
(keep combines on the Pallas fast path) is void — its sequential
L=ceil(chunk/256) intra-block lax.scan is pure serial latency. assoc's
log-depth levels should win at tiny d.

Run: PYTHONPATH=/root/repo python -u scripts/profile/profile_temporal.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax


def time_step(m, n=5):
    step = jax.jit(lambda mm: mm.step_with_elbo(0.5))
    m2, e = step(m)
    _ = float(e)
    t0 = time.perf_counter()
    for _ in range(n):
        m2, e = step(m2)
    _ = float(e)
    return (time.perf_counter() - t0) / n, float(e)


def main():
    from physs_gp_tpu.zoo.bench_configs import build_temporal

    T = 100_000
    results = {}
    cases = [
        # (mode, blocks, chunk); blocks only matters for blocked mode
        ("blocked", 256, 20_000), ("blocked", 256, 50_000),
        ("blocked", 1024, 50_000), ("blocked", 4096, 50_000),
        ("blocked", 4096, 100_000), ("blocked", 1024, 100_000),
        ("assoc", 0, 20_000), ("assoc", 0, 50_000), ("assoc", 0, 100_000),
    ]
    for mode, blocks, chunk in cases:
        os.environ["PHYSS_INNER_SCAN"] = mode
        if blocks:
            os.environ["PHYSS_SCAN_BLOCKS"] = str(blocks)
        m = build_temporal(T, chunk)
        dt, e = time_step(m)
        sps = T / dt
        results[(mode, blocks, chunk)] = sps
        print(f"mode={mode:8s} blocks={blocks:5d} chunk={str(chunk):7s} "
              f"{dt * 1e3:8.2f} ms/step  {sps / 1e6:6.2f} M steps/s "
              f"elbo={e:.4f}", flush=True)
    best = max(results, key=results.get)
    print("BEST:", best, f"{results[best] / 1e6:.2f} M steps/s")


if __name__ == "__main__":
    main()
