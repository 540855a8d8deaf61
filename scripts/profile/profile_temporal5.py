"""Temporal d=2 schedule sweep measured IN-GRAPH (K-step lax.scan loop).

Single-dispatch sweeps are relay-floor-bound (~8 ms no-op); this re-runs the
schedule × blocks × chunk sweep with the surrogate pass looped K times inside
one jit. At d=2 the flat combine is pure elementwise XLA, so associative_scan
(log-depth, ~2 full-width kernels per level) competes with blocked's
L-iteration sequential intra-block loop.

Run: PYTHONPATH=/root/repo python -u scripts/profile/profile_temporal5.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

T = 100_000
K = 20


def chain_time(fn, m, n=3):
    step = jax.jit(fn)
    m2 = step(m)
    _ = float(m2.sites.Y[0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        m2 = step(m2)
    _ = float(m2.sites.Y[0, 0])
    return (time.perf_counter() - t0) / n


def main():
    from physs_gp_tpu.utils.struct import replace
    from physs_gp_tpu.zoo.bench_configs import build_temporal

    cases = [
        ("blocked", 1024, 50_000), ("blocked", 2048, 50_000),
        ("blocked", 4096, 50_000), ("blocked", 2048, 100_000),
        ("blocked", 4096, 100_000),
        ("assoc", 0, 50_000), ("assoc", 0, 100_000), ("assoc", 0, None),
    ]
    results = {}
    for mode, blocks, chunk in cases:
        os.environ["PHYSS_INNER_SCAN"] = mode
        if blocks:
            os.environ["PHYSS_SCAN_BLOCKS"] = str(blocks)
        m = build_temporal(T, chunk)

        def loop(mm):
            def body(carry, _):
                lml, mean, S = carry._surrogate_pass()
                dep = 1e-30 * (lml + jnp.sum(mean[-1]) + jnp.sum(S[-1]))
                return replace(
                    carry, sites=replace(carry.sites, Y=carry.sites.Y + dep)
                ), None

            out, _ = jax.lax.scan(body, mm, None, length=K)
            return out

        dt = chain_time(loop, m) / K
        results[(mode, blocks, chunk)] = dt
        print(f"mode={mode:8s} blocks={blocks:5d} chunk={str(chunk):7s} "
              f"{dt * 1e3:8.3f} ms/pass", flush=True)
    best = min(results, key=results.get)
    print("BEST:", best, f"{results[best] * 1e3:.3f} ms/pass")

    # full CVI step at the winning schedule, in-graph
    mode, blocks, chunk = best
    os.environ["PHYSS_INNER_SCAN"] = mode
    if blocks:
        os.environ["PHYSS_SCAN_BLOCKS"] = str(blocks)
    m = build_temporal(T, chunk)

    def loop_step(mm):
        def body(carry, _):
            m2, e = carry.step_with_elbo(0.5)
            return m2, e

        out, _ = jax.lax.scan(body, mm, None, length=K)
        return out

    dt = chain_time(loop_step, m) / K
    print(f"full CVI step @ best: {dt * 1e3:.3f} ms/step "
          f"({T / dt / 1e6:.2f} M steps/s)")


if __name__ == "__main__":
    main()
