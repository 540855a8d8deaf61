"""Temporal d=2 IN-GRAPH stage attribution.

Single-dispatch measurements through the axon relay are floor-bound at
~8-12 ms regardless of the graph (measured: a no-op `d+1.0` on [100k] costs
7.6 ms) — so each stage is looped K times INSIDE one jit via lax.scan and
the per-iteration cost read off the slope. Only in-graph time is real
(CLAUDE.md rule 8).

Run: PYTHONPATH=/root/repo python -u scripts/profile/profile_temporal4.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("PHYSS_INNER_SCAN", "blocked")
os.environ.setdefault("PHYSS_SCAN_BLOCKS", "1024")

import jax
import jax.numpy as jnp

T = 100_000
CHUNK = 50_000
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
    from physs_gp_tpu.ops.lgssm import build_lgssm
    from physs_gp_tpu.ops.parallel_kalman import (
        parallel_kalman_filter,
        parallel_rts_smoother,
    )
    from physs_gp_tpu.utils.struct import replace
    from physs_gp_tpu.zoo.bench_configs import build_temporal

    m = build_temporal(T, CHUNK)

    def loop(stage):
        def run(mm):
            def body(carry, _):
                return stage(carry), None

            out, _ = jax.lax.scan(body, mm, None, length=K)
            return out

        return run

    def fold(mm, x):
        return replace(mm, sites=replace(mm.sites, Y=mm.sites.Y + 1e-30 * x))

    def s_noop(mm):
        return fold(mm, jnp.float32(1.0))

    def s_trans(mm):
        from physs_gp_tpu.kernels.markov import transition_matrix

        dt = jnp.concatenate(
            [jnp.zeros((1,), mm.t.dtype), jnp.diff(mm.t)]
        ) + 1e-30 * mm.sites.Y[0, 0]
        return fold(mm, jnp.sum(transition_matrix(mm.kernel, dt)))

    def s_noise(mm):
        dt = jnp.concatenate(
            [jnp.zeros((1,), mm.t.dtype), jnp.diff(mm.t)]
        ) + 1e-30 * mm.sites.Y[0, 0]
        return fold(mm, jnp.sum(mm.kernel.noise_cov(dt)))

    def s_build(mm):
        ssm = build_lgssm(mm.kernel, mm.t + 1e-30 * mm.sites.Y[0, 0])
        return fold(mm, jnp.sum(ssm.A) + jnp.sum(ssm.Q))

    def s_filter(mm):
        ssm = build_lgssm(mm.kernel, mm.t + 1e-30 * mm.sites.Y[0, 0])
        f = parallel_kalman_filter(
            ssm.A, ssm.Q, ssm.H, mm.sites.V, mm.sites.Y, ssm.m0, ssm.P0,
            chunk_size=mm.chunk_size,
        )
        return fold(mm, f.lml + jnp.sum(f.ms[-1]))

    def s_fs(mm):
        ssm = build_lgssm(mm.kernel, mm.t + 1e-30 * mm.sites.Y[0, 0])
        f = parallel_kalman_filter(
            ssm.A, ssm.Q, ssm.H, mm.sites.V, mm.sites.Y, ssm.m0, ssm.P0,
            chunk_size=mm.chunk_size,
        )
        s = parallel_rts_smoother(ssm.A, ssm.Q, f, chunk_size=mm.chunk_size)
        return fold(mm, f.lml + jnp.sum(s.ms[-1]) + jnp.sum(s.Ps[-1]))

    def s_surr(mm):
        lml, mean, S = mm._surrogate_pass()
        return fold(mm, lml + jnp.sum(mean[-1]) + jnp.sum(S[-1]))

    def s_step(mm):
        return mm.step_with_elbo(0.5)[0]

    base = None
    for name, fn in [
        ("no-op", s_noop),
        ("A(dt) transition", s_trans),
        ("Q(dt) noise_cov (gammainc)", s_noise),
        ("lgssm build (A+Q)", s_build),
        ("build + filter", s_filter),
        ("build + filter + smoother", s_fs),
        ("surrogate pass (w/ project)", s_surr),
        ("full CVI step", s_step),
    ]:
        dt = chain_time(loop(fn), m)
        per = dt / K
        if base is None:
            base = per
        print(f"{name:28s}: {per * 1e3:8.3f} ms/iter "
              f"(net {max(per - base, 0) * 1e3:8.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
