"""Staged attribution of the config-5 covariance-form CVI step (round 3).

Times CUMULATIVE stages of `step_with_elbo` on the real T=100k workload so
the deltas attribute wall-clock to: lgssm build, filter scan, smoother,
H-projections, ELL terms, natgrad update. Chain-call timing per CLAUDE.md
rule 8 (host float() sync; relay latency makes unchained repeats lie).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile/profile_c5f.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import CHUNK, T5, build_config5
from physs_gp_tpu.utils.struct import replace


def chain(m, c):
    return replace(
        m, sites=replace(m.sites, V=m.sites.V + jnp.asarray(1e-30, m.t.dtype) * c)
    )


def timeit(f, m, reps=5):
    f = jax.jit(f)
    c = float(f(m, jnp.asarray(0.0, m.t.dtype)))
    t0 = time.perf_counter()
    cc = jnp.asarray(c, m.t.dtype) * 1e-30
    for _ in range(reps):
        cc = f(m, cc) * 1e-30
    _ = float(cc)
    return (time.perf_counter() - t0) / reps


def main():
    from physs_gp_tpu.ops.lgssm import build_lgssm, project_cov, project_mean
    from physs_gp_tpu.ops.runner import run_filter, run_filter_smoother

    m = build_config5(T5, CHUNK)

    def inputs(mm):
        ssm = build_lgssm(mm.kernel, mm.t)
        if mm.observation is not None:
            ssm = ssm._replace(H=mm.observation.H(mm.kernel))
        return ssm, mm.sites.V, mm.sites.Y

    def p_lgssm(mm, c):
        ssm, R, Y = inputs(chain(mm, c))
        return ssm.A.sum() + ssm.Q.sum() + ssm.H.sum() + R.sum()

    def p_filter(mm, c):
        mm = chain(mm, c)
        ssm, R, Y = inputs(mm)
        f, _ = run_filter(ssm, R, Y, parallel=True, chunk_size=mm.chunk_size)
        return f.lml + f.ms.sum() + f.Ps.sum()

    def p_smoother(mm, c):
        mm = chain(mm, c)
        ssm, R, Y = inputs(mm)
        f, s = run_filter_smoother(
            ssm, R, Y, parallel=True, chunk_size=mm.chunk_size
        )
        return f.lml + s.ms.sum() + s.Ps.sum()

    def p_project(mm, c):
        mm = chain(mm, c)
        ssm, R, Y = inputs(mm)
        f, s = run_filter_smoother(
            ssm, R, Y, parallel=True, chunk_size=mm.chunk_size
        )
        mproj = project_mean(ssm.H, s.ms)
        S = project_cov(ssm.H, s.Ps)
        return f.lml + mproj.sum() + S.sum()

    def p_elbo(mm, c):
        return chain(mm, c).elbo()

    def p_step(mm, c):
        m2, e = chain(mm, c).step_with_elbo(0.5)
        return e + m2.sites.V.sum() * 1e-30

    prev = 0.0
    for name, fn in [
        ("lgssm build", p_lgssm),
        ("+ filter", p_filter),
        ("+ smoother", p_smoother),
        ("+ projections", p_project),
        ("+ elbo terms", p_elbo),
        ("full step", p_step),
    ]:
        t = timeit(fn, m)
        print(f"{name:15s} {t*1e3:9.2f} ms  (delta {((t-prev))*1e3:+8.2f} ms)",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
