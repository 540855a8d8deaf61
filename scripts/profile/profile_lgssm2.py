"""Explain the 86 ms 'lgssm build' bucket of profile_c5f: how much is the
model-pytree argument overhead (chain + 400 MB V sites) vs the actual build.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile/profile_lgssm2.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import T5, build_config5
from physs_gp_tpu.utils.struct import replace


def chain(m, c):
    return replace(
        m, sites=replace(m.sites, V=m.sites.V + jnp.asarray(1e-30, m.t.dtype) * c)
    )


def timeit(f, m, reps=10):
    f = jax.jit(f)
    c = float(f(m, jnp.asarray(0.0, m.t.dtype)))
    t0 = time.perf_counter()
    cc = jnp.asarray(c, m.t.dtype) * 1e-30
    for _ in range(reps):
        cc = f(m, cc) * 1e-30
    _ = float(cc)
    return (time.perf_counter() - t0) / reps


def main():
    from physs_gp_tpu.ops.lgssm import build_lgssm

    m = build_config5(T5, 20_000)

    def p_chain_only(mm, c):
        mm = chain(mm, c)
        return mm.sites.V.sum() + mm.sites.Y.sum()

    def p_build_no_R(mm, c):
        mm = chain(mm, c)
        ssm = build_lgssm(mm.kernel, mm.t)
        if mm.observation is not None:
            ssm = ssm._replace(H=mm.observation.H(mm.kernel))
        return ssm.A.sum() + ssm.Q.sum() + ssm.H.sum() + mm.sites.V[0].sum() * (1 + c)

    def p_build_with_R(mm, c):
        mm = chain(mm, c)
        ssm = build_lgssm(mm.kernel, mm.t)
        if mm.observation is not None:
            ssm = ssm._replace(H=mm.observation.H(mm.kernel))
        return ssm.A.sum() + ssm.Q.sum() + ssm.H.sum() + mm.sites.V.sum()

    for name, fn in [
        ("chain+V/Y sums only", p_chain_only),
        ("chain+build (no R sum)", p_build_no_R),
        ("chain+build (R sum)", p_build_with_R),
    ]:
        print(f"{name:26s} {timeit(fn, m)*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
