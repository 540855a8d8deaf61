"""Which wall does the config-5 step actually sit against? (VERDICT r4 #3)

Replaces the asserted "latency- not throughput-bound" with measurements:

1. T-scaling: full-step wall time at T ∈ {25k, 50k, 100k, 200k} (CHUNK
   fixed at 20k → outer-scan length scales with T). Least-squares fit
   t(T) = a + b·T splits the step into a T-independent floor `a` (compiled
   graph depth: per-level combine kernels, launch gaps, host dispatch) and
   a throughput part `b·T`.
2. XLA cost analysis per T: flops + bytes accessed of the compiled step →
   achieved GFLOP/s and GB/s vs the v5e ceilings (32.8 TFLOP/s effective
   fp32, 819 GB/s HBM). If b·T dominates AND achieved GB/s ≈ ceiling →
   HBM-bound; if both fractions are small and `a` dominates → latency/
   depth-bound.

Times use the in-graph K-loop + chained host fetch (CLAUDE.md rule 8).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile/profile_wall.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 20_000
K = 3
PEAK_FP32 = 197e12 / 6.0
PEAK_HBM = 819e9


def main():
    from physs_gp_tpu.trainers import natgrad_scan
    from physs_gp_tpu.utils.struct import replace
    from physs_gp_tpu.zoo.bench_configs import build_config5

    def step_k(mm):
        return natgrad_scan(mm, 0.5, n_steps=K, nan_guard=False)[0]

    rows = []
    for T in (25_000, 50_000, 100_000, 200_000):
        m = build_config5(T, CHUNK)
        jitted = jax.jit(step_k)
        flops = nbytes = None
        try:
            comp = jitted.lower(m).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            ca = ca or {}
            flops = (ca.get("flops") or 0) / K
            nbytes = (ca.get("bytes accessed") or 0) / K
            run = comp
        except Exception:
            run = jitted
        # chained timing, one host fetch per dispatch
        m2 = run(m)
        _ = float(m2.sites.Y[0, 0])
        reps = 2
        t0 = time.perf_counter()
        for _ in range(reps):
            m2 = run(m2)
        _ = float(m2.sites.Y[0, 0])
        dt = (time.perf_counter() - t0) / (reps * K)  # per step
        row = {"T": T, "t_step_ms": round(dt * 1e3, 1),
               "steps_per_sec": round(T / dt, 1)}
        if flops:
            row["achieved_gflops"] = round(flops / dt / 1e9, 1)
            row["fp32_roofline_frac"] = round(flops / dt / PEAK_FP32, 6)
        if nbytes:
            row["achieved_gbps"] = round(nbytes / dt / 1e9, 2)
            row["hbm_frac"] = round(nbytes / dt / PEAK_HBM, 4)
        rows.append(row)
        print(json.dumps(row), flush=True)

    Ts = np.array([r["T"] for r in rows], float)
    ts = np.array([r["t_step_ms"] for r in rows], float)
    b, a = np.polyfit(Ts, ts, 1)
    t100 = a + b * 1e5
    print(f"\nfit: t(T) = {a:.1f} ms + {b * 1e3:.4f} ms/kstep")
    print(f"at T=100k: floor a = {a:.1f} ms ({a / t100:.0%} of step), "
          f"throughput bT = {b * 1e5:.1f} ms ({b * 1e5 / t100:.0%})")
    out = {"rows": rows, "fit_floor_ms": round(a, 2),
           "fit_ms_per_kstep": round(b * 1e3, 4),
           "floor_fraction_at_100k": round(a / t100, 3)}
    with open("results/wall_decomposition.json", "w") as f:
        json.dump(out, f, indent=2)
    print("saved -> results/wall_decomposition.json")


if __name__ == "__main__":
    main()
