"""One-shot TPU sweep of the scan/precision knobs on the config-5 step.

Each configuration re-jits a FRESH callable (the knobs are read at trace
time), runs the full CVI step chained per CLAUDE.md rule 8, and prints a
table. Run after any scan-core change to re-validate the knob defaults:

  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile/sweep_knobs.py
  PHYSS_SWEEP_SQRT=1 ...            # sweep the sqrt path instead

Expect minutes of Mosaic compile per NEW kernel shape on first run
(CLAUDE.md rule 11); configurations reuse shapes where possible.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import CHUNK, T5, build_config5
from physs_gp_tpu.utils.struct import replace

SWEEPS = [
    # (label, env overrides)
    ("default (blocked/256)", {}),
    ("fused-narrow 128", {"PHYSS_FUSED_NARROW": "128"}),
    ("fused-narrow 256", {"PHYSS_FUSED_NARROW": "256"}),
    ("fused-narrow 512", {"PHYSS_FUSED_NARROW": "512"}),
    ("scan-blocks 128", {"PHYSS_SCAN_BLOCKS": "128"}),
    ("matmul high", {"PHYSS_MATMUL_PRECISION": "high"}),
]

KNOBS = [
    "PHYSS_INNER_SCAN",
    "PHYSS_SCAN_BLOCKS",
    "PHYSS_FUSED_NARROW",
    "PHYSS_FUSED_COMBINE",
    "PHYSS_MATMUL_PRECISION",
    "PHYSS_PREFIX_COMBINE",
]


def time_step(m, reps=5):
    step = jax.jit(lambda mm: mm.step_with_elbo(0.5))  # fresh jit per config
    m2, e = step(m)
    _ = float(e)
    t0 = time.perf_counter()
    for _ in range(reps):
        m2, e = step(m2)
    _ = float(e)
    return (time.perf_counter() - t0) / reps, float(e)


def main():
    m = build_config5(T5, CHUNK)
    if os.environ.get("PHYSS_SWEEP_SQRT", "0") == "1":
        m = replace(m, sqrt=True)
        print("sweeping SQRT path", flush=True)
    base_elbo = None
    for label, env in SWEEPS:
        saved = {k: os.environ.get(k) for k in KNOBS}
        os.environ.update(env)
        try:
            dt, e = time_step(m)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        if base_elbo is None:
            base_elbo = e
        drift = abs(e - base_elbo) / max(abs(base_elbo), 1e-30)
        print(
            f"{label:24s} {dt*1e3:8.1f} ms  {T5/dt:9.1f} steps/s  "
            f"elbo drift {drift:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
