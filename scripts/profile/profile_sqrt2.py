"""Finer sqrt-path attribution: element build vs inner scan vs lml, plus
wide-batch per-op microbenches (the B=256 numbers carry per-call overhead).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile/profile_sqrt2.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts/profile")

import jax
import jax.numpy as jnp

from bench import CHUNK, T5, build_config5
from physs_gp_tpu.utils.struct import replace
from profile_sqrt import _chain_model, micro, time_probe


def main():
    from physs_gp_tpu.ops.lgssm import build_lgssm
    from physs_gp_tpu.ops.matrix import bmm, gen_solve, safe_cholesky_rel
    from physs_gp_tpu.ops.parallel_sqrt_kalman import (
        _SqrtFilterElems,
        _build_sqrt_elements,
        _per_step_lml_sqrt,
        _sqrt_filtering_operator,
    )
    from physs_gp_tpu.ops.kalman import observation_mask
    from physs_gp_tpu.ops.parallel_kalman import _inner_scan
    from physs_gp_tpu.ops.sqrt_kalman import tria, tria_sum

    B, d = 20_000, 32
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    X64 = jax.random.normal(ks[0], (B, d, 2 * d), jnp.float32)
    M = jnp.eye(d) + 0.1 * jax.random.normal(ks[1], (B, d, d), jnp.float32)
    Rhs = jax.random.normal(ks[2], (B, d, d), jnp.float32)

    out = {}
    out["tria[20k,32,64]fr"] = micro(
        lambda c: tria(X64 * (1 + c), assume_full_rank=True), n_iter=50)
    out["tria[20k,32,64]reg"] = micro(lambda c: tria(X64 * (1 + c)), n_iter=50)
    out["tria_sum[20k,32+32]"] = micro(
        lambda c: tria_sum(M * (1 + c), Rhs), n_iter=50)
    out["gj_solve[20k,32,32]"] = micro(
        lambda c: gen_solve(M * (1 + c), Rhs), n_iter=50)
    out["bmm[20k,32,32]"] = micro(lambda c: bmm(M * (1 + c), Rhs), n_iter=50)
    for k, v in out.items():
        print(f"{k:22s} {v*1e6:9.2f} us/call  ({v/B*1e9:7.1f} ns/matrix)",
              flush=True)

    # staged sqrt filter probes on the real config-5 model
    m = replace(build_config5(T5, CHUNK), sqrt=True)

    def inputs(mm):
        ssm = build_lgssm(mm.kernel, mm.t)
        if mm.observation is not None:
            ssm = ssm._replace(H=mm.observation.H(mm.kernel))
        return ssm, mm.sites.V, mm.sites.Y

    def chunked_parts(mm, with_scan):
        ssm, R, Y = inputs(mm)
        T = Y.shape[0]
        Q_sqrt = safe_cholesky_rel(ssm.Q)
        R_sqrt = safe_cholesky_rel(R)
        P0_sqrt = safe_cholesky_rel(ssm.P0)
        mask = observation_mask(Y, P0_sqrt.dtype)
        H = ssm.H if ssm.H.ndim == 3 else jnp.broadcast_to(
            ssm.H, (T,) + ssm.H.shape)
        n_chunks = T // CHUNK
        parts = jax.tree_util.tree_map(
            lambda x: x.reshape((n_chunks, CHUNK) + x.shape[1:]),
            (ssm.A, Q_sqrt, H, R_sqrt, Y, mask),
        )

        def chunk_step(carry, inp):
            m_prev, U_prev = carry
            A_c, Qs_c, H_c, Rs_c, y_c, mask_c = inp
            elems = _build_sqrt_elements(
                A_c, Qs_c, H_c, Rs_c, y_c, mask_c, m_prev, U_prev
            )
            if with_scan:
                dd, dt = elems.A.shape[-1], elems.A.dtype
                inner = _inner_scan(
                    _sqrt_filtering_operator, elems,
                    ident=_SqrtFilterElems(
                        A=jnp.eye(dd, dtype=dt), b=jnp.zeros((dd,), dt),
                        U=jnp.zeros((dd, dd), dt), eta=jnp.zeros((dd,), dt),
                        Z=jnp.zeros((dd, dd), dt)),
                )
                return (inner.b[-1], inner.U[-1]), (
                    inner.b.sum() + inner.U.sum())
            return (m_prev + elems.b[-1], U_prev + elems.U[-1]), (
                elems.A.sum() + elems.b.sum() + elems.U.sum()
                + elems.eta.sum() + elems.Z.sum())

        init = (ssm.m0, P0_sqrt)
        (_, _), acc = jax.lax.scan(chunk_step, init, parts)
        return acc.sum()

    def p_build(mm, c):
        return chunked_parts(_chain_model(mm, c), with_scan=False)

    def p_scan(mm, c):
        return chunked_parts(_chain_model(mm, c), with_scan=True)

    def p_lml_only(mm, c):
        ssm, R, Y = inputs(_chain_model(mm, c))
        T = Y.shape[0]
        Q_sqrt = safe_cholesky_rel(ssm.Q)
        R_sqrt = safe_cholesky_rel(R)
        P0_sqrt = safe_cholesky_rel(ssm.P0)
        mask = observation_mask(Y, P0_sqrt.dtype)
        H = ssm.H if ssm.H.ndim == 3 else jnp.broadcast_to(
            ssm.H, (T,) + ssm.H.shape)
        ms = jnp.zeros((T, ssm.m0.shape[-1]), Y.dtype) + 0.01
        Us = jnp.broadcast_to(P0_sqrt, (T,) + P0_sqrt.shape) * (1 + 0 * c)
        lmls = _per_step_lml_sqrt(
            ssm.A, Q_sqrt, H, R_sqrt, Y, mask, ms, ssm.m0, P0_sqrt, Us)
        return lmls.sum()

    for name, fn in [("build", p_build), ("build+scan", p_scan),
                     ("lml", p_lml_only)]:
        t = time_probe(fn, m, 3)
        print(f"{name:10s} {t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
