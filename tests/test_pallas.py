"""Pallas kernel equivalence on CPU via the interpreter.

The TPU fast paths (lane-batched Gauss-Jordan solves, the fused
filtering/smoothing combines) are gated off on CPU, so the test suite would
never execute the kernel bodies. Here we run them through the Pallas
interpreter and check numerical equivalence against the XLA reference
implementations, plus gradient correctness of the solve-calculus custom VJPs.

Reference provenance: the combine being fused is the associative filtering
operator of Särkkä & García-Fernández (reference
`src/lib/stgp/computation/filters/parallel_kalman_filter.py`); the kernels
themselves have no reference analogue (TPU-specific design).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from physs_gp_tpu.ops.pallas import batched_linalg as bl
from physs_gp_tpu.ops.pallas import fused_combine as fc
from physs_gp_tpu.ops.parallel_kalman import (
    _FilterElems,
    _SmootherElems,
    _filtering_operator_xla,
    _smoothing_operator_xla,
)
from physs_gp_tpu.ops.matrix import psd_solve, psd_solve_logdet, gen_solve


def _spd(rng, B, d, dom=5.0):
    A = rng.normal(size=(B, d, d))
    return (A @ np.swapaxes(A, -1, -2) / d + dom * np.eye(d)).astype(np.float64)


def test_batch_solve_interpret():
    rng = np.random.default_rng(0)
    B, d, r = 300, 7, 3  # non-multiple of 128 exercises lane padding
    A = _spd(rng, B, d)
    R = rng.normal(size=(B, d, r))
    X = bl.batch_solve(jnp.asarray(A), jnp.asarray(R), interpret=True)
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(A, R), rtol=1e-9)


def test_batch_solve_logdet_interpret():
    rng = np.random.default_rng(1)
    B, d, r = 200, 5, 2
    A = _spd(rng, B, d)
    R = rng.normal(size=(B, d, r))
    X, ld = bl.batch_solve_logdet(jnp.asarray(A), jnp.asarray(R), interpret=True)
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(A, R), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(ld), np.linalg.slogdet(A)[1], rtol=1e-10
    )


def test_batch_matmul_interpret():
    rng = np.random.default_rng(2)
    B, d = 140, 6
    A = rng.normal(size=(B, d, d))
    Bm = rng.normal(size=(B, d, d))
    C = bl.batch_matmul(jnp.asarray(A), jnp.asarray(Bm), interpret=True)
    np.testing.assert_allclose(np.asarray(C), A @ Bm, rtol=1e-12)


def _rand_filter_elems(rng, B, d):
    mk = lambda s=0.1: rng.normal(size=(B, d, d)) * s
    spd = lambda: _spd(rng, B, d, dom=1.0) * 0.3
    return _FilterElems(
        A=jnp.asarray(mk()),
        b=jnp.asarray(rng.normal(size=(B, d))),
        C=jnp.asarray(spd()),
        J=jnp.asarray(spd()),
        eta=jnp.asarray(rng.normal(size=(B, d))),
    )


def test_fused_filtering_combine_interpret(monkeypatch):
    monkeypatch.setattr(fc, "_INTERPRET", True)
    rng = np.random.default_rng(3)
    B, d = 130, 9
    ei, ej = _rand_filter_elems(rng, B, d), _rand_filter_elems(rng, B, d)
    out = fc.fused_filtering_combine(ei, ej)
    ref = _filtering_operator_xla(ei, ej)
    for name in out._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)),
            np.asarray(getattr(ref, name)),
            rtol=1e-8, atol=1e-10, err_msg=name,
        )


def test_fused_filtering_combine_grad(monkeypatch):
    monkeypatch.setattr(fc, "_INTERPRET", True)
    rng = np.random.default_rng(4)
    B, d = 128, 4
    ei, ej = _rand_filter_elems(rng, B, d), _rand_filter_elems(rng, B, d)

    def loss(op, e1, e2):
        o = op(e1, e2)
        return jnp.sum(o.b ** 2) + jnp.sum(o.C ** 2) + jnp.sum(o.eta * o.b)

    g_f = jax.grad(lambda a, b: loss(fc.fused_filtering_combine, a, b),
                   argnums=(0, 1))(ei, ej)
    g_x = jax.grad(lambda a, b: loss(_filtering_operator_xla, a, b),
                   argnums=(0, 1))(ei, ej)
    for gf, gx in zip(jax.tree_util.tree_leaves(g_f),
                      jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   rtol=1e-7, atol=1e-9)


def test_fused_smoothing_combine_interpret(monkeypatch):
    monkeypatch.setattr(fc, "_INTERPRET", True)
    rng = np.random.default_rng(5)
    B, d = 150, 11
    mk = lambda: rng.normal(size=(B, d, d)) * 0.2
    se = lambda: _SmootherElems(
        E=jnp.asarray(mk()),
        g=jnp.asarray(rng.normal(size=(B, d))),
        L=jnp.asarray(_spd(rng, B, d, dom=0.5)),
    )
    sj, si = se(), se()
    out = fc.fused_smoothing_combine(sj, si)
    ref = _smoothing_operator_xla(sj, si)
    for name in out._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(out, name)),
            np.asarray(getattr(ref, name)),
            rtol=1e-8, atol=1e-10, err_msg=name,
        )


def test_psd_solve_grads_match_builtin():
    """The custom solve-calculus VJP must equal autodiff through cholesky."""
    rng = np.random.default_rng(6)
    B, d, r = 12, 5, 2
    A = _spd(rng, B, d)
    R = rng.normal(size=(B, d, r))

    def f_custom(Aj):
        return jnp.sum(psd_solve(Aj, jnp.asarray(R), jitter=None) ** 2)

    def f_builtin(Aj):
        sym = 0.5 * (Aj + jnp.swapaxes(Aj, -1, -2))
        return jnp.sum(jnp.linalg.solve(sym, jnp.asarray(R)) ** 2)

    gA = jax.grad(f_custom)(jnp.asarray(A))
    gB = jax.grad(f_builtin)(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(gA), np.asarray(gB), rtol=1e-8)


def test_psd_solve_logdet_grads_match_builtin():
    rng = np.random.default_rng(7)
    B, d, r = 8, 6, 3
    A = _spd(rng, B, d)
    R = rng.normal(size=(B, d, r))

    def f_custom(Aj):
        X, ld = psd_solve_logdet(Aj, jnp.asarray(R), jitter=None)
        return jnp.sum(X ** 2) + 2.0 * jnp.sum(ld)

    def f_builtin(Aj):
        sym = 0.5 * (Aj + jnp.swapaxes(Aj, -1, -2))
        X = jnp.linalg.solve(sym, jnp.asarray(R))
        ld = jnp.linalg.slogdet(sym)[1]
        return jnp.sum(X ** 2) + 2.0 * jnp.sum(ld)

    gA = jax.grad(f_custom)(jnp.asarray(A))
    gB = jax.grad(f_builtin)(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(gA), np.asarray(gB), rtol=1e-8)


def test_gen_solve_grads_match_builtin():
    rng = np.random.default_rng(8)
    B, d = 10, 4
    A = rng.normal(size=(B, d, d)) + 3 * np.eye(d)  # identity-dominated
    R = rng.normal(size=(B, d, d))

    def f_custom(Aj):
        return jnp.sum(gen_solve(Aj, jnp.asarray(R)) ** 3)

    def f_builtin(Aj):
        return jnp.sum(jnp.linalg.solve(Aj, jnp.asarray(R)) ** 3)

    gA = jax.grad(f_custom)(jnp.asarray(A))
    gB = jax.grad(f_builtin)(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(gA), np.asarray(gB), rtol=1e-8)


def test_batch_bmm_interpret_all_transposes():
    rng = np.random.default_rng(9)
    B, m, k, n = 150, 6, 5, 7
    for ta in (False, True):
        for tb in (False, True):
            A = rng.normal(size=(B, k, m) if ta else (B, m, k))
            Bx = rng.normal(size=(B, n, k) if tb else (B, k, n))
            C = bl.batch_bmm(jnp.asarray(A), jnp.asarray(Bx), ta=ta, tb=tb,
                             interpret=True)
            a = np.swapaxes(A, 1, 2) if ta else A
            b = np.swapaxes(Bx, 1, 2) if tb else Bx
            np.testing.assert_allclose(np.asarray(C), a @ b, rtol=1e-12,
                                       err_msg=f"ta={ta} tb={tb}")


def test_bmm_grads_match_einsum():
    from physs_gp_tpu.ops.matrix import bmm

    rng = np.random.default_rng(10)
    B, d = 12, 4
    A = jnp.asarray(rng.normal(size=(B, d, d)))
    Bx = jnp.asarray(rng.normal(size=(B, d, d)))
    for ta in (False, True):
        for tb in (False, True):
            def f(a, b):
                return jnp.sum(bmm(a, b, ta, tb) ** 3)

            def f_ref(a, b):
                ae = jnp.swapaxes(a, 1, 2) if ta else a
                be = jnp.swapaxes(b, 1, 2) if tb else b
                return jnp.sum(jnp.einsum("bij,bjk->bik", ae, be) ** 3)

            gA, gB = jax.grad(f, argnums=(0, 1))(A, Bx)
            rA, rB = jax.grad(f_ref, argnums=(0, 1))(A, Bx)
            np.testing.assert_allclose(np.asarray(gA), np.asarray(rA),
                                       rtol=1e-10, err_msg=f"A ta={ta} tb={tb}")
            np.testing.assert_allclose(np.asarray(gB), np.asarray(rB),
                                       rtol=1e-10, err_msg=f"B ta={ta} tb={tb}")


def test_batch_tria_interpret():
    from physs_gp_tpu.ops.pallas.batched_qr import batch_tria

    rng = np.random.default_rng(11)
    for (B, d, m) in [(300, 5, 9), (280, 8, 16), (130, 3, 3)]:
        X = rng.normal(size=(B, d, m))
        L = np.asarray(batch_tria(jnp.asarray(X), interpret=True))
        np.testing.assert_allclose(
            L @ np.swapaxes(L, 1, 2), X @ np.swapaxes(X, 1, 2),
            rtol=1e-10, atol=1e-10,
        )
        assert np.allclose(np.triu(L, 1), 0.0)
        assert (np.diagonal(L, axis1=1, axis2=2) >= -1e-12).all()


def test_tria_custom_vjp_matches_xla():
    from physs_gp_tpu.ops.sqrt_kalman import _tria_canonical_xla, tria

    rng = np.random.default_rng(12)
    X = jnp.asarray(rng.normal(size=(10, 4, 7)))
    g = jax.grad(lambda b: jnp.sum(tria(b) ** 2) + jnp.sum(tria(b)[:, 0]))(X)
    # reference: autodiff straight through the XLA QR (same canonical factor)
    g2 = jax.grad(
        lambda b: jnp.sum(_tria_canonical_xla(b) ** 2)
        + jnp.sum(_tria_canonical_xla(b)[:, 0])
    )(X)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), rtol=1e-8)


def test_batch_chol_gram_interpret():
    from physs_gp_tpu.ops.pallas.batched_chol import batch_chol_gram

    rng = np.random.default_rng(13)
    for (B, d, mx, my) in [(300, 5, 5, 5), (280, 8, 16, 8), (130, 3, 7, 0)]:
        X = rng.normal(size=(B, d, mx))
        Y = rng.normal(size=(B, d, my)) if my else None
        for plus_eye in (False, True):
            L = np.asarray(batch_chol_gram(
                jnp.asarray(X), None if Y is None else jnp.asarray(Y),
                plus_eye=plus_eye, interpret=True,
            ))
            ref = X @ np.swapaxes(X, 1, 2)
            if Y is not None:
                ref = ref + Y @ np.swapaxes(Y, 1, 2)
            if plus_eye:
                ref = ref + np.eye(d)
            np.testing.assert_allclose(
                L @ np.swapaxes(L, 1, 2), ref, rtol=1e-9, atol=1e-9,
            )
            assert np.allclose(np.triu(L, 1), 0.0)
            assert (np.diagonal(L, axis1=1, axis2=2) >= 0.0).all()


def test_batch_chol_gram_rank_deficient_and_zero():
    from physs_gp_tpu.ops.pallas.batched_chol import batch_chol_gram

    rng = np.random.default_rng(14)
    B, d = 130, 6
    # rank-2 Gram + an all-zero matrix in the batch
    X = rng.normal(size=(B, d, 2))
    X[0] = 0.0
    L = np.asarray(batch_chol_gram(jnp.asarray(X), interpret=True))
    assert np.isfinite(L).all()
    ref = X @ np.swapaxes(X, 1, 2)
    scale = np.maximum(np.trace(ref, axis1=1, axis2=2)[:, None, None] / d,
                       1.0)
    np.testing.assert_allclose(
        (L @ np.swapaxes(L, 1, 2) - ref) / scale, 0.0, atol=1e-6,
    )


def test_tria_sum_kernel_path_matches_tria(monkeypatch):
    import functools

    from physs_gp_tpu.ops.pallas import batched_chol as bc
    from physs_gp_tpu.ops.sqrt_kalman import tria, tria_sum

    monkeypatch.setattr(bc, "use_pallas_chol", lambda *a, **k: True)
    monkeypatch.setattr(
        bc, "batch_chol_gram",
        functools.partial(bc.batch_chol_gram.__wrapped__, interpret=True),
    )
    rng = np.random.default_rng(15)
    B, d = 140, 5
    X = jnp.asarray(rng.normal(size=(B, d, d)))
    Y = jnp.asarray(rng.normal(size=(B, d, d)))
    # include exactly-zero pre-arrays (zeroed first-element factors)
    X = X.at[3].set(0.0)
    Y = Y.at[3].set(0.0)
    for args in [(X, Y), (X, None), (X, None, True), (X, Y, True)]:
        got = np.asarray(tria_sum(*args))
        parts = [a for a in args[:2] if a is not None]
        if len(args) > 2 and args[2]:
            parts.append(jnp.broadcast_to(jnp.eye(d), (B, d, d)))
        ref = np.asarray(tria(jnp.concatenate(parts, axis=-1)))
        np.testing.assert_allclose(
            got @ np.swapaxes(got, 1, 2), ref @ np.swapaxes(ref, 1, 2),
            rtol=1e-8, atol=1e-10,
        )


def test_tria_sum_custom_vjp_matches_fallback(monkeypatch):
    import functools

    from physs_gp_tpu.ops.pallas import batched_chol as bc
    from physs_gp_tpu.ops import sqrt_kalman as sk

    rng = np.random.default_rng(16)
    B, d = 140, 4
    X = jnp.asarray(rng.normal(size=(B, d, d)))
    Y = jnp.asarray(rng.normal(size=(B, d, d)))

    def loss(x, y):
        return (jnp.sum(sk.tria_sum(x, y) ** 2)
                + jnp.sum(sk.tria_sum(x, plus_eye=True)[:, 0]))

    g_ref = jax.grad(loss, argnums=(0, 1))(X, Y)  # fallback (gate off on CPU)
    monkeypatch.setattr(bc, "use_pallas_chol", lambda *a, **k: True)
    monkeypatch.setattr(
        bc, "batch_chol_gram",
        functools.partial(bc.batch_chol_gram.__wrapped__, interpret=True),
    )
    g_k = jax.grad(loss, argnums=(0, 1))(X, Y)
    for gk, gr in zip(jax.tree_util.tree_leaves(g_k),
                      jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                                   rtol=1e-6, atol=1e-9)


def test_batch_cholesky_interpret():
    from physs_gp_tpu.ops.pallas.batched_chol import batch_cholesky

    rng = np.random.default_rng(17)
    B, d = 200, 7
    X = rng.normal(size=(B, d, d + 3))
    A = X @ np.swapaxes(X, 1, 2) + 0.1 * np.eye(d)
    L = np.asarray(batch_cholesky(jnp.asarray(A), interpret=True))
    np.testing.assert_allclose(L @ np.swapaxes(L, 1, 2), A,
                               rtol=1e-9, atol=1e-9)
    assert np.allclose(np.triu(L, 1), 0.0)
    ref = np.linalg.cholesky(A)
    np.testing.assert_allclose(L, ref, rtol=1e-7, atol=1e-9)


def test_pallas_chol_core_grad_matches_xla(monkeypatch):
    import functools

    from physs_gp_tpu.ops import matrix as mx
    from physs_gp_tpu.ops.pallas import batched_chol as bc

    monkeypatch.setattr(bc, "use_pallas_chol", lambda *a, **k: True)
    monkeypatch.setattr(
        bc, "batch_cholesky",
        functools.partial(bc.batch_cholesky.__wrapped__, interpret=True),
    )
    rng = np.random.default_rng(18)
    B, d = 140, 5
    X = rng.normal(size=(B, d, d + 2))
    A = jnp.asarray(X @ np.swapaxes(X, 1, 2) + 0.2 * np.eye(d))

    def loss(a):
        L = mx.safe_cholesky_rel(a)
        return jnp.sum(L ** 2) + jnp.sum(L[:, 0])

    g_k = jax.grad(loss)(A)
    monkeypatch.setattr(bc, "use_pallas_chol", lambda *a, **k: False)
    g_x = jax.grad(loss)(A)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                               rtol=1e-7, atol=1e-9)


def test_sklansky_scan_matches_associative_scan():
    from physs_gp_tpu.ops.parallel_kalman import _sklansky_scan

    rng = np.random.default_rng(19)
    for n in (8, 64, 256):
        # non-commutative associative op: 2x2 matrix products + running sum
        A = jnp.asarray(rng.normal(size=(n, 2, 2)) * 0.3 + np.eye(2))
        b = jnp.asarray(rng.normal(size=(n, 2)))

        def op(e1, e2):
            A1, b1 = e1
            A2, b2 = e2
            return (jnp.einsum("...ij,...jk->...ik", A2, A1),
                    jnp.einsum("...ij,...j->...i", A2, b1) + b2)

        got = _sklansky_scan(op, (A, b))
        ref = jax.lax.associative_scan(op, (A, b))
        for g, r in zip(got, ref):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=1e-10, atol=1e-12)


def test_tria_assume_full_rank_matches_regularised():
    from physs_gp_tpu.ops.sqrt_kalman import tria

    rng = np.random.default_rng(20)
    B, d = 12, 5
    # full-row-rank pre-arrays: [X, I] Woodbury shape
    X = rng.normal(size=(B, d, d))
    pre = jnp.asarray(np.concatenate([X, np.tile(np.eye(d), (B, 1, 1))], -1))
    fr = np.asarray(tria(pre, assume_full_rank=True))
    reg = np.asarray(tria(pre))
    np.testing.assert_allclose(fr @ np.swapaxes(fr, 1, 2),
                               reg @ np.swapaxes(reg, 1, 2),
                               rtol=1e-9, atol=1e-11)
    # gradients stay finite and match the regularised path
    g_fr = jax.grad(lambda b: jnp.sum(tria(b, assume_full_rank=True) ** 2))(pre)
    g_rg = jax.grad(lambda b: jnp.sum(tria(b) ** 2))(pre)
    assert np.isfinite(np.asarray(g_fr)).all()
    np.testing.assert_allclose(np.asarray(g_fr), np.asarray(g_rg),
                               rtol=1e-5, atol=1e-8)
