"""Temporal d=2 stage attribution with CHAINED jitted pipelines.

Every stage is measured as a model -> model function (fold a zero-scaled
summary of the stage output back into sites.Y) so successive calls chain
through real data dependencies — unchained same-arg repeats give garbage
numbers through the axon relay (CLAUDE.md rule 8).

Run: PYTHONPATH=/root/repo python -u scripts/profile/profile_temporal3.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ["PHYSS_INNER_SCAN"] = "blocked"
os.environ["PHYSS_SCAN_BLOCKS"] = "1024"

import jax
import jax.numpy as jnp

T = 100_000
CHUNK = 50_000


def chain_time(fn, m, n=5):
    step = jax.jit(fn)
    m2 = step(m)
    _ = float(m2.sites.Y[0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        m2 = step(m2)
    _ = float(m2.sites.Y[0, 0])
    return (time.perf_counter() - t0) / n


def main():
    from physs_gp_tpu.ops.lgssm import build_lgssm
    from physs_gp_tpu.ops.parallel_kalman import (
        parallel_kalman_filter,
        parallel_rts_smoother,
    )
    from physs_gp_tpu.utils.struct import replace
    from physs_gp_tpu.zoo.bench_configs import build_temporal

    m = build_temporal(T, CHUNK)

    def fold(mm, x):
        return replace(
            mm, sites=replace(mm.sites, Y=mm.sites.Y + 0.0 * x)
        )

    def f_build(mm):
        ssm = build_lgssm(mm.kernel, mm.t)
        return fold(mm, jnp.sum(ssm.A) + jnp.sum(ssm.Q))

    def f_filter(mm):
        ssm = build_lgssm(mm.kernel, mm.t)
        f = parallel_kalman_filter(
            ssm.A, ssm.Q, ssm.H, mm.sites.V, mm.sites.Y, ssm.m0, ssm.P0,
            chunk_size=mm.chunk_size,
        )
        return fold(mm, f.lml + jnp.sum(f.ms[-1]))

    def f_filter_smooth(mm):
        ssm = build_lgssm(mm.kernel, mm.t)
        f = parallel_kalman_filter(
            ssm.A, ssm.Q, ssm.H, mm.sites.V, mm.sites.Y, ssm.m0, ssm.P0,
            chunk_size=mm.chunk_size,
        )
        s = parallel_rts_smoother(ssm.A, ssm.Q, f, chunk_size=mm.chunk_size)
        return fold(mm, f.lml + jnp.sum(s.ms[-1]) + jnp.sum(s.Ps[-1]))

    def f_surrogate(mm):
        lml, mean, S = mm._surrogate_pass()
        return fold(mm, lml + jnp.sum(mean[-1]) + jnp.sum(S[-1]))

    def f_elbo(mm):
        return fold(mm, mm.elbo())

    def f_step(mm):
        mm2, e = mm.step_with_elbo(0.5)
        return mm2

    for name, fn in [
        ("lgssm element build        ", f_build),
        ("+ parallel filter          ", f_filter),
        ("+ rts smoother             ", f_filter_smooth),
        ("surrogate pass (w/ project)", f_surrogate),
        ("elbo (pass + ELLs)         ", f_elbo),
        ("full CVI step              ", f_step),
    ]:
        dt = chain_time(fn, m)
        print(f"{name}: {dt * 1e3:8.2f} ms  "
              f"({T / dt / 1e6:6.2f} M steps/s)", flush=True)


if __name__ == "__main__":
    main()
