"""Temporal d=2 focused sweep around the round-4 optimum (blocked, 1024,
50k) + stage attribution of the winning config.

Run: PYTHONPATH=/root/repo python -u scripts/profile/profile_temporal2.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax


def time_fn(fn, arg, n=5):
    out = fn(arg)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    x = arg
    for _ in range(n):
        out = fn(x)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


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
        (512, 50_000), (1024, 25_000), (2048, 50_000),
        (1024, 50_000), (2048, 100_000),
    ]
    os.environ["PHYSS_INNER_SCAN"] = "blocked"
    for blocks, chunk in cases:
        os.environ["PHYSS_SCAN_BLOCKS"] = str(blocks)
        m = build_temporal(T, chunk)
        dt, e = time_step(m)
        sps = T / dt
        results[(blocks, chunk)] = sps
        print(f"blocks={blocks:5d} chunk={chunk:7d} {dt * 1e3:8.2f} ms/step "
              f"{sps / 1e6:6.2f} M steps/s elbo={e:.4f}", flush=True)
    best = max(results, key=results.get)
    print("BEST:", best, f"{results[best] / 1e6:.2f} M steps/s")

    # stage attribution at the winning config
    blocks, chunk = best
    os.environ["PHYSS_SCAN_BLOCKS"] = str(blocks)
    m = build_temporal(T, chunk)
    import jax.numpy as jnp

    dt_post = time_fn(
        jax.jit(lambda mm: mm.posterior().mean), m
    )
    print(f"  posterior (filter+smooth+project): {dt_post * 1e3:8.2f} ms")
    dt_elbo = time_fn(jax.jit(lambda mm: mm.elbo()), m)
    print(f"  elbo (surrogate filter + ELL):     {dt_elbo * 1e3:8.2f} ms")
    dt_ng = time_fn(
        jax.jit(lambda mm: mm.natural_gradient_update(0.5).sites.Y), m
    )
    print(f"  natgrad update (post + site math): {dt_ng * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
