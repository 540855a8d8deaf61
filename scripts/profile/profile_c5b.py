"""Finer config-5 attribution: element build vs inner scan, chunk-size sweep.

Probes (chained, all outputs consumed):
  build-only   outer lax.scan over chunks that BUILDS filtering elements and
               reduces them (no combine) — isolates element construction
  filter       full chunked filter (build + inner associative scans + lml)
  step@chunk   full step_with_elbo at several chunk sizes

Run: PYTHONPATH=/root/repo python -u scripts/profile/profile_c5b.py
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


def timeit(f, m, reps=5):
    f = jax.jit(f)
    c = f(m, jnp.asarray(0.0, m.t.dtype))
    c = float(c)
    t0 = time.perf_counter()
    cc = jnp.asarray(c, m.t.dtype) * 1e-30
    for _ in range(reps):
        cc = f(m, cc) * 1e-30
    _ = float(cc)
    return (time.perf_counter() - t0) / reps


def make_build_only(chunk):
    from physs_gp_tpu.ops.lgssm import build_lgssm
    from physs_gp_tpu.ops.kalman import observation_mask
    from physs_gp_tpu.ops.parallel_kalman import _build_filter_elements

    def probe(m, c):
        mm = chain(m, c)
        ssm = build_lgssm(mm.kernel, mm.t)
        ssm = ssm._replace(H=mm.observation.H(mm.kernel))
        Y, R = mm.sites.Y, mm.sites.V
        T = Y.shape[0]
        mask = observation_mask(Y, ssm.P0.dtype)
        H = jnp.broadcast_to(ssm.H, (T,) + ssm.H.shape[-2:])
        n = T // chunk
        ch = jax.tree_util.tree_map(
            lambda x: x.reshape((n, chunk) + x.shape[1:]),
            (ssm.A, ssm.Q, H, R, Y, mask),
        )

        def body(carry, inp):
            A_c, Q_c, H_c, R_c, y_c, mask_c = inp
            e = _build_filter_elements(
                A_c, Q_c, H_c, R_c, y_c, mask_c, ssm.m0, ssm.P0
            )
            s = sum(x.sum() for x in e)
            return carry + s, None

        tot, _ = jax.lax.scan(body, jnp.asarray(0.0, Y.dtype), ch)
        return tot

    return probe


def p_filter(m, c):
    from physs_gp_tpu.ops.lgssm import build_lgssm
    from physs_gp_tpu.ops.runner import run_filter

    mm = chain(m, c)
    ssm = build_lgssm(mm.kernel, mm.t)
    ssm = ssm._replace(H=mm.observation.H(mm.kernel))
    f, _ = run_filter(
        ssm, mm.sites.V, mm.sites.Y, parallel=True, chunk_size=mm.chunk_size
    )
    return f.lml + f.ms.sum() + f.Ps.sum()


def p_step(m, c):
    m2, e = chain(m, c).step_with_elbo(0.5)
    return e + m2.sites.V.sum() * 1e-30


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else T5
    m = build_config5(T, 5000)
    t = timeit(make_build_only(5000), m)
    print(f"build-only@5000  {t*1e3:9.2f} ms", flush=True)
    t = timeit(p_filter, m)
    print(f"filter@5000      {t*1e3:9.2f} ms", flush=True)
    for chunk in (2500, 5000, 10000, 25000):
        mc = build_config5(T, chunk)
        t = timeit(p_step, mc)
        print(f"step@{chunk:<6d}     {t*1e3:9.2f} ms   "
              f"({T/t:,.0f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
