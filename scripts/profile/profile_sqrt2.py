"""Config-5 sqrt-path IN-GRAPH stage attribution (vs covariance form).

Each stage loops K times inside one jit (single-dispatch timings carry the
~8 ms relay floor; at 350-620 ms steps the floor is small but the in-place
carry reuse is not — match the bench methodology). Carry is the model; every
stage folds a 1e-30-scaled output into sites.Y so XLA cannot hoist it.

Run: PYTHONPATH=/root/repo python -u scripts/profile/profile_sqrt2.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

T = 100_000
CHUNK = 20_000
K = 2


def chain_time(fn, m, n=2):
    step = jax.jit(fn)
    m2 = step(m)
    _ = float(m2.sites.Y[0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        m2 = step(m2)
    _ = float(m2.sites.Y[0, 0])
    return (time.perf_counter() - t0) / (n * K)


def main():
    from physs_gp_tpu.ops.runner import run_filter, run_filter_smoother
    from physs_gp_tpu.ops.lgssm import build_lgssm
    from physs_gp_tpu.utils.struct import replace
    from physs_gp_tpu.zoo.bench_configs import build_config5

    m = build_config5(T, CHUNK)

    def loop(stage):
        def run(mm):
            def body(carry, _):
                return stage(carry), None

            out, _ = jax.lax.scan(body, mm, None, length=K)
            return out

        return run

    def fold(mm, x):
        return replace(mm, sites=replace(mm.sites, Y=mm.sites.Y + 1e-30 * x))

    def ssm_of(mm):
        ssm = build_lgssm(mm.kernel, mm.t + 1e-30 * mm.sites.Y[0, 0])
        if mm.observation is not None:
            ssm = ssm._replace(H=mm.observation.H(mm.kernel))
        return ssm

    def s_filter(sqrt):
        def f(mm):
            ssm = ssm_of(mm)
            fr, _ = run_filter(ssm, mm.sites.V, mm.sites.Y, parallel=True,
                               sqrt=sqrt, chunk_size=mm.chunk_size)
            return fold(mm, fr.lml + jnp.sum(fr.ms[-1]))

        return f

    def s_fs(sqrt):
        def f(mm):
            ssm = ssm_of(mm)
            fr, sr = run_filter_smoother(
                ssm, mm.sites.V, mm.sites.Y, parallel=True, sqrt=sqrt,
                chunk_size=mm.chunk_size,
            )
            return fold(mm, fr.lml + jnp.sum(sr.ms[-1]))

        return f

    def s_step(mm):
        return mm.step_with_elbo(0.5)[0]

    def s_build_cov(mm):
        from physs_gp_tpu.ops.parallel_kalman import _build_filter_elements
        from physs_gp_tpu.ops.kalman import observation_mask

        ssm = ssm_of(mm)
        Y = mm.sites.Y
        mask = observation_mask(Y, ssm.P0.dtype)
        Ht = jnp.broadcast_to(ssm.H, (T,) + ssm.H.shape[-2:])
        e = _build_filter_elements(
            jnp.broadcast_to(ssm.A, (T,) + ssm.A.shape[-2:]) if ssm.A.ndim == 2 else ssm.A,
            jnp.broadcast_to(ssm.Q, (T,) + ssm.Q.shape[-2:]) if ssm.Q.ndim == 2 else ssm.Q,
            Ht, mm.sites.V, Y, mask, ssm.m0, ssm.P0,
        )
        return fold(mm, jnp.sum(e.b[-1]) + jnp.sum(e.C[-1]))

    def s_lml_cov(mm):
        from physs_gp_tpu.ops.parallel_kalman import _per_step_lml
        from physs_gp_tpu.ops.kalman import observation_mask

        ssm = ssm_of(mm)
        Y = mm.sites.Y
        mask = observation_mask(Y, ssm.P0.dtype)
        Ht = jnp.broadcast_to(ssm.H, (T,) + ssm.H.shape[-2:])
        # ms stand-in: the site means (same shapes/layout as filtered means)
        ms = jnp.einsum("tpd,tp->td", Ht, jnp.nan_to_num(Y))
        Ps = jnp.broadcast_to(ssm.P0, (T,) + ssm.P0.shape)
        lmls, Pp = _per_step_lml(
            ssm.A, ssm.Q, Ht, mm.sites.V, Y, mask, ms, ssm.m0, ssm.P0, Ps
        )
        return fold(mm, jnp.sum(lmls) + jnp.sum(Pp[-1]))

    ms_sqrt = replace(m, sqrt=True)
    for name, fn, mdl in [
        ("cov  elements only", s_build_cov, m),
        ("cov  per-step lml ", s_lml_cov, m),
        ("cov  filter       ", s_filter(False), m),
        ("sqrt filter       ", s_filter(True), m),
        ("cov  filter+smooth", s_fs(False), m),
        ("sqrt filter+smooth", s_fs(True), m),
        ("cov  full step    ", s_step, m),
        ("sqrt full step    ", s_step, ms_sqrt),
    ]:
        dt = chain_time(loop(fn), mdl)
        print(f"{name}: {dt * 1e3:8.1f} ms  ({T / dt / 1e3:7.1f} k steps/s)",
              flush=True)


if __name__ == "__main__":
    main()
