"""Iterative-solver gates: PCG solves and SLQ log-determinants vs the dense
oracle, and BatchGP(solver="cg") vs the Cholesky path.

Covers the reference's `settings.linear_solver` CG mode
(`/root/reference/src/lib/stgp/computation/linalg.py:13-90`) — here a
static per-call/per-model choice with a preconditioner, fixed-trip scans,
implicit-diff gradients, and an SLQ logdet instead of the reference's
O(n^3) full eigendecomposition.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.models.batch_gp import BatchGP
from physs_gp_tpu.kernels.rbf import RBF
from physs_gp_tpu.likelihoods.gaussian import Gaussian
from physs_gp_tpu.ops.cg import cg_solve, log_determinant, slq_logdet, solve
from physs_gp_tpu.utils.params import positive_param


def _spd(n, seed=0, cond=None):
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)
    return jnp.asarray(A)


def test_cg_matches_dense_solve():
    n = 64
    A = _spd(n)
    B = jnp.asarray(np.random.default_rng(1).standard_normal((n, 5)))
    X = cg_solve(A, B, jitter=0.0, tol=1e-12)
    Xe = jnp.linalg.solve(A, B)
    assert float(jnp.max(jnp.abs(X - Xe))) < 1e-10
    # vector RHS keeps the vector shape
    x = cg_solve(A, B[:, 0], jitter=0.0, tol=1e-12)
    assert x.shape == (n,)
    assert float(jnp.max(jnp.abs(x - Xe[:, 0]))) < 1e-10


def test_cg_batched_and_unpreconditioned():
    n = 32
    A = jnp.stack([_spd(n, 0), _spd(n, 1)])
    B = jnp.asarray(np.random.default_rng(2).standard_normal((2, n, 3)))
    Xe = jnp.linalg.solve(A, B)
    for precond in ("jacobi", None):
        X = cg_solve(A, B, jitter=0.0, tol=1e-12, precond=precond)
        assert float(jnp.max(jnp.abs(X - Xe))) < 1e-9


def test_cg_illconditioned_preconditioned():
    # strongly scaled diagonal: Jacobi keeps CG convergent in few iters
    n = 50
    rng = np.random.default_rng(3)
    d = 10.0 ** rng.uniform(-3, 3, n)
    Q = rng.standard_normal((n, n)) * 0.01
    A = jnp.asarray(np.diag(d) + Q @ Q.T)
    b = jnp.asarray(rng.standard_normal(n))
    x = cg_solve(A, b, jitter=0.0, tol=1e-13, maxiter=3 * n)
    xe = jnp.linalg.solve(A, b)
    assert float(jnp.max(jnp.abs(x - xe)) / jnp.max(jnp.abs(xe))) < 1e-8


def test_cg_gradients_match_exact():
    n = 40
    A = _spd(n, 4)
    B = jnp.asarray(np.random.default_rng(5).standard_normal((n, 2)))

    def f_cg(A, B):
        return jnp.sum(cg_solve(A, B, jitter=0.0, tol=1e-13) ** 2)

    def f_ex(A, B):
        # cg_solve solves against sym(A) — the dense oracle must too, or
        # its A-gradient differs by the (un)symmetrised cotangent
        return jnp.sum(
            jnp.linalg.solve(0.5 * (A + A.T), B) ** 2
        )

    gA, gB = jax.grad(f_cg, argnums=(0, 1))(A, B)
    gAe, gBe = jax.grad(f_ex, argnums=(0, 1))(A, B)
    assert float(jnp.max(jnp.abs(gA - gAe))) < 1e-7 * float(
        jnp.max(jnp.abs(gAe))
    ) + 1e-12
    assert float(jnp.max(jnp.abs(gB - gBe))) < 1e-10


def test_slq_logdet_accuracy_and_grad():
    n = 80
    A = _spd(n, 6)
    key = jax.random.PRNGKey(0)
    ld = slq_logdet(A, key, jitter=0.0, n_probes=32, lanczos_iters=48)
    lde = jnp.linalg.slogdet(A)[1]
    assert abs(float(ld - lde) / float(lde)) < 0.02
    # hyperparameter-direction gradients (what training uses): d/ds of
    # logdet(s A) = n / s is estimated exactly; a diagonal shift direction
    # carries the Hutchinson noise floor
    g = jax.grad(
        lambda s: slq_logdet(
            s * A, key, jitter=0.0, n_probes=32, lanczos_iters=48
        )
    )(1.5)
    assert abs(float(g) - n / 1.5) / (n / 1.5) < 1e-6

    gd = jax.grad(
        lambda s: slq_logdet(
            A + s * jnp.eye(n), key, jitter=0.0, n_probes=32,
            lanczos_iters=48,
        )
    )(3.0)
    gde = jax.grad(
        lambda s: jnp.linalg.slogdet(A + s * jnp.eye(n))[1]
    )(3.0)
    assert abs(float(gd - gde) / float(gde)) < 0.1


def test_dispatchers():
    n = 30
    A = _spd(n, 7)
    B = jnp.asarray(np.random.default_rng(8).standard_normal((n, 2)))
    Xe = jnp.linalg.solve(A, B)
    for method in ("cholesky", "cg", "exact"):
        X = solve(A, B, method, jitter=0.0, **(
            {"tol": 1e-12} if method == "cg" else {}
        ))
        assert float(jnp.max(jnp.abs(X - Xe))) < 1e-7
    lde = jnp.linalg.slogdet(A)[1]
    assert abs(float(log_determinant(A, "cholesky", jitter=0.0) - lde)) < 1e-7
    assert abs(float(log_determinant(A, "exact", jitter=0.0) - lde)) < 1e-9
    ld = log_determinant(
        A, "slq", key=jax.random.PRNGKey(1), jitter=0.0, n_probes=32,
        lanczos_iters=30,
    )
    assert abs(float(ld - lde) / float(lde)) < 0.03
    with pytest.raises(ValueError):
        solve(A, B, "qr")
    with pytest.raises(ValueError):
        log_determinant(A, "slq")  # needs a key


def _make_gps(seed=0, solver="cg", N=90):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(np.sort(rng.uniform(0, 5, N))[:, None])
    Y = jnp.asarray(
        np.sin(2.0 * np.asarray(X)) + 0.1 * rng.standard_normal((N, 1))
    )
    Y = Y.at[5, 0].set(jnp.nan)  # exercise the mask path
    kern = RBF(
        lengthscales=positive_param(0.7), variance=positive_param(1.0)
    )
    lik = Gaussian(variance=positive_param(0.05))
    chol = BatchGP(X=X, Y=Y, kernel=kern, likelihood=lik)
    it = BatchGP(
        X=X, Y=Y, kernel=kern, likelihood=lik, solver=solver,
        cg_tol=1e-12, slq_probes=64, slq_iters=64,
    )
    return chol, it


def test_batch_gp_cg_matches_cholesky():
    chol, it = _make_gps()
    lml_c = float(jax.jit(lambda m: m.log_marginal_likelihood())(chol))
    lml_i = float(jax.jit(lambda m: m.log_marginal_likelihood())(it))
    # quad term is exact; the lml error is 0.5x the SLQ logdet's ~1%
    # stochastic error — gate against the LOGDET scale, not the (small,
    # heavily cancelled) lml total
    Km, _, _ = chol._masked_gram()
    ld = float(jnp.linalg.slogdet(Km)[1])
    assert abs(lml_i - lml_c) < 0.01 * abs(ld)

    Xs = jnp.linspace(-0.5, 5.5, 40)[:, None]
    fc = jax.jit(lambda m: m.predict_f(Xs))(chol)
    fi = jax.jit(lambda m: m.predict_f(Xs))(it)
    assert float(jnp.max(jnp.abs(fc.mean - fi.mean))) < 1e-7
    assert float(jnp.max(jnp.abs(fc.var - fi.var))) < 1e-7

    mc, Cc = jax.jit(lambda m: m.predict_f(Xs, full_cov=True))(chol)
    mi, Ci = jax.jit(lambda m: m.predict_f(Xs, full_cov=True))(it)
    assert float(jnp.max(jnp.abs(mc - mi))) < 1e-7
    assert float(jnp.max(jnp.abs(Cc - Ci))) < 1e-7


def test_batch_gp_cg_gradients():
    _, it = _make_gps()

    def loss(m):
        return -m.log_marginal_likelihood()

    g = jax.jit(jax.grad(loss))(it)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    # the kernel-hyperparameter gradient agrees with the Cholesky path up
    # to the Hutchinson noise floor of the logdet's trace gradient
    # (~1/sqrt(n_probes) ≈ 12% relative, on the logdet component only)
    chol, _ = _make_gps()
    gc = jax.jit(jax.grad(loss))(chol)
    gl_i = float(g.kernel.lengthscales.raw)
    gl_c = float(gc.kernel.lengthscales.raw)
    assert abs(gl_i - gl_c) / (abs(gl_c) + 1e-12) < 0.35
    assert np.sign(gl_i) == np.sign(gl_c)
