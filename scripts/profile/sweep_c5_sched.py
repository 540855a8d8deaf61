"""Config-5 schedule sweep: chunk_size x PHYSS_SCAN_BLOCKS at d=32.

The production (CHUNK=20000, BLOCKS=256) point was tuned in round 3 under
an older blocked-scan schedule (before reduced distribute combines,
init-folded carries, one-launch Woodbury). Re-sweep under the current
schedule with the in-graph K-loop timing (CLAUDE.md rule 8): the knobs are
trace-time, so each point sets the env BEFORE building/compiling.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile/sweep_c5_sched.py
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

T = 100_000
K = 3
POINTS = [
    (20_000, "256"),
    (20_000, "512"),
    (25_000, "256"),
    (50_000, "256"),
    (50_000, "512"),
]


def main():
    from physs_gp_tpu.trainers import natgrad_scan
    from physs_gp_tpu.zoo.bench_configs import build_config5

    rows = []
    for chunk, blocks in POINTS:
        os.environ["PHYSS_SCAN_BLOCKS"] = blocks  # trace-time knob
        m = build_config5(T, chunk)
        step = jax.jit(
            lambda mm: natgrad_scan(mm, 0.5, n_steps=K, nan_guard=False)[0]
        )
        m2 = step(m)
        _ = float(m2.sites.Y[0, 0])
        reps = 2
        t0 = time.perf_counter()
        for _ in range(reps):
            m2 = step(m2)
        _ = float(m2.sites.Y[0, 0])
        dt = (time.perf_counter() - t0) / (reps * K)
        row = {"chunk": chunk, "blocks": int(blocks),
               "t_step_ms": round(dt * 1e3, 1),
               "steps_per_sec": round(T / dt, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    best = max(rows, key=lambda r: r["steps_per_sec"])
    print(f"best: chunk={best['chunk']} blocks={best['blocks']} "
          f"{best['steps_per_sec']:.0f} steps/s")


if __name__ == "__main__":
    main()
