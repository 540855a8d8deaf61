"""Attribute the config-5 SQRT-path step time (TPU) + combine microbenches.

The sqrt path (fp32-robust, used by the TPU Allen-Cahn experiment) runs
~18.5k steps/s vs 175.7k covariance-form — a ~9.5x tax. Its combine does
4 `tria` (lane-batched Householder LQ, on [B,32,96] after the gradient-reg
concat) + 5 triangular solves (Pallas GJ) + bmms. All four trias are
Cholesky factors of PSD SUMS (no downdates), so chol(X X^T + Y Y^T) via a
lane-batched Cholesky kernel is a candidate replacement.

Stage probes (chained; CLAUDE.md rule 8) + in-graph op microbenches at the
combine batch width (256).

Run: PYTHONPATH=/root/repo python -u scripts/profile/profile_sqrt.py [T] [reps]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import CHUNK, T5, build_config5
from physs_gp_tpu.utils.struct import replace


def _chain_model(m, c):
    return replace(
        m, sites=replace(m.sites, V=m.sites.V + jnp.asarray(1e-30, m.t.dtype) * c)
    )


def make_probes():
    from physs_gp_tpu.ops.lgssm import build_lgssm
    from physs_gp_tpu.ops.runner import run_filter, run_filter_smoother

    def inputs(m):
        ssm = build_lgssm(m.kernel, m.t)
        if m.observation is not None:
            ssm = ssm._replace(H=m.observation.H(m.kernel))
        return ssm, m.sites.V, m.sites.Y

    def p_filter(m, c):
        ssm, R, Y = inputs(_chain_model(m, c))
        f, _ = run_filter(ssm, R, Y, parallel=True, sqrt=True,
                          chunk_size=m.chunk_size)
        return f.lml + f.ms.sum() + f.Ps.sum()

    def p_smoother(m, c):
        ssm, R, Y = inputs(_chain_model(m, c))
        f, s = run_filter_smoother(ssm, R, Y, parallel=True, sqrt=True,
                                   chunk_size=m.chunk_size)
        return f.lml + s.ms.sum() + s.Ps.sum()

    def p_step(m, c):
        m2, e = _chain_model(m, c).step_with_elbo(0.5)
        return e + m2.sites.V.sum() * 1e-30

    return {"filter": p_filter, "smoother": p_smoother, "step": p_step}


def time_probe(fn, m, reps):
    f = jax.jit(fn)
    c = jnp.asarray(0.0, m.t.dtype)
    c = float(f(m, c))
    t0 = time.perf_counter()
    cc = jnp.asarray(c, m.t.dtype) * 1e-30
    for _ in range(reps):
        cc = f(m, cc) * 1e-30
    _ = float(cc)
    return (time.perf_counter() - t0) / reps


def micro(op_factory, n_iter=200, reps=3):
    """Time one op in-graph: lax.scan chaining via a scalar carry."""

    def body(c, _):
        out = op_factory(c)
        return out.sum() * 1e-30, ()

    @jax.jit
    def run(c0):
        c, _ = jax.lax.scan(body, c0, None, length=n_iter)
        return c

    c = float(run(jnp.asarray(0.0, jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        c = float(run(jnp.asarray(c, jnp.float32) * 1e-30))
    return (time.perf_counter() - t0) / (reps * n_iter)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else T5
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    B, d = 256, 32

    from physs_gp_tpu.ops.matrix import bmm, gen_solve
    from physs_gp_tpu.ops.parallel_sqrt_kalman import (
        _SqrtFilterElems,
        _sqrt_filtering_operator,
    )
    from physs_gp_tpu.ops.parallel_kalman import (
        _filtering_operator,
        _ident_filter_elem,
    )
    from physs_gp_tpu.ops.sqrt_kalman import tria

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    X64 = jax.random.normal(ks[0], (B, d, 2 * d), jnp.float32)
    M = jnp.eye(d) + 0.1 * jax.random.normal(ks[1], (B, d, d), jnp.float32)
    Rhs = jax.random.normal(ks[2], (B, d, d), jnp.float32)

    out = {}
    out["tria[B,32,64]"] = micro(lambda c: tria(X64 * (1 + c)))
    out["gj_solve[B,32,32]"] = micro(lambda c: gen_solve(M * (1 + c), Rhs))
    out["bmm[B,32,32]"] = micro(lambda c: bmm(M * (1 + c), Rhs))
    out["chol_xla[B,32,32]"] = micro(
        lambda c: jnp.linalg.cholesky(
            bmm(M, M, tb=True) * (1 + c) + 10.0 * jnp.eye(d)
        )
    )

    def mk_elems(c):
        s = 1 + c
        return _SqrtFilterElems(
            A=M * s, b=Rhs[:, :, 0], U=jnp.tril(M), eta=Rhs[:, :, 1],
            Z=jnp.tril(Rhs) * s,
        )

    out["sqrt_combine[B=256]"] = micro(
        lambda c: _sqrt_filtering_operator(mk_elems(c), mk_elems(c * 2)).U
    )

    def mk_cov(c):
        s = 1 + c
        e = _ident_filter_elem(d, jnp.float32)
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape) + 0 * s, e
        )._replace(A=M * s, C=bmm(M, M, tb=True), J=bmm(Rhs, Rhs, tb=True) * 1e-2)

    out["cov_combine[B=256]"] = micro(
        lambda c: _filtering_operator(mk_cov(c), mk_cov(c * 2)).C
    )

    for k, v in out.items():
        print(f"{k:24s} {v*1e6:9.2f} us/call", flush=True)

    m = build_config5(T, CHUNK)
    m = replace(m, sqrt=True)
    probes = make_probes()
    stage = {}
    for name, fn in probes.items():
        stage[name] = time_probe(fn, m, reps)
        print(f"{name:10s} {stage[name]*1e3:9.2f} ms", flush=True)
    print(json.dumps(
        {**{k: round(v * 1e6, 2) for k, v in out.items()},
         **{k: round(v * 1e3, 2) for k, v in stage.items()}}
    ))


if __name__ == "__main__":
    main()
