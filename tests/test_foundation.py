import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.utils import params as P
from physs_gp_tpu.utils.struct import module, static
from physs_gp_tpu.ops import matrix as M
from physs_gp_tpu.ops import gaussian as G


def test_module_pytree_roundtrip():
    @module
    class Foo:
        x: jnp.ndarray
        name: str = static(default="a")

    f = Foo(x=jnp.ones(3), name="bar")
    leaves, treedef = jax.tree_util.tree_flatten(f)
    assert len(leaves) == 1
    f2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert f2.name == "bar"
    # static fields are trace-time constants
    out = jax.jit(lambda m: m.x * 2)(f)
    np.testing.assert_allclose(out, 2.0)


def test_positive_param_roundtrip():
    p = P.positive_param(2.5)
    np.testing.assert_allclose(p.value, 2.5, rtol=1e-12)
    p2 = p.with_value(0.001)
    np.testing.assert_allclose(p2.value, 0.001, rtol=1e-6)


def test_fixed_param_stops_gradient():
    p = P.positive_param(2.0)

    def loss(p):
        return p.value**2

    g = jax.grad(loss)(p)
    assert np.abs(g.raw) > 0
    gf = jax.grad(loss)(p.fix())
    np.testing.assert_allclose(gf.raw, 0.0)


def test_tril_pack_unpack():
    L = jnp.array([[1.0, 0.0], [2.0, 3.0]])
    v = P.fill_triangular_inverse(L)
    np.testing.assert_allclose(P.fill_triangular(v, 2), L)


def test_cholesky_solve():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(5, 5))
    A = A @ A.T + 5 * np.eye(5)
    b = rng.normal(size=(5, 2))
    L = M.safe_cholesky(jnp.asarray(A), jitter=0.0)
    x = M.cholesky_solve(L, jnp.asarray(b))
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-9)


def test_robust_cholesky_escalates_per_element():
    """Indefinite-by-3e-4 block gets escalated jitter; PSD block stays tight;
    gradients stay finite (the TPU fp32 H P H^T failure mode, replicated at
    fp64 scale via an explicit rel)."""
    rng = np.random.default_rng(0)
    Q, _ = np.linalg.qr(rng.normal(size=(4, 4)))
    good = Q @ np.diag([1.0, 0.5, 0.1, 0.01]) @ Q.T
    bad = Q @ np.diag([1.0, 0.5, 0.1, -3e-4]) @ Q.T
    S = jnp.asarray(np.stack([good, bad]))
    L = M.robust_cholesky(S, rel=1e-6)
    assert bool(jnp.all(jnp.isfinite(L)))
    rec = np.asarray(L @ jnp.swapaxes(L, -1, -2))
    np.testing.assert_allclose(rec[0], good, atol=1e-5)  # base jitter only
    np.testing.assert_allclose(rec[1], bad, atol=2e-2)  # escalated, bounded
    g = jax.grad(lambda A: jnp.sum(M.robust_cholesky(A, rel=1e-6)))(S)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_block_diag_roundtrip():
    blocks = jnp.arange(12.0).reshape(3, 2, 2)
    big = M.to_block_diag_batched(blocks)
    back = M.get_block_diagonal(big, 2)
    np.testing.assert_allclose(back, blocks)


def test_diag_from_XDXT():
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.normal(size=(4, 6)))
    D = rng.normal(size=(6, 6))
    D = jnp.asarray(D @ D.T)
    np.testing.assert_allclose(
        M.diag_from_XDXT(X, D), np.diag(X @ D @ X.T), rtol=1e-10
    )


def test_kron_mv():
    rng = np.random.default_rng(2)
    A = jnp.asarray(rng.normal(size=(3, 3)))
    B = jnp.asarray(rng.normal(size=(4, 4)))
    x = jnp.asarray(rng.normal(size=(12,)))
    np.testing.assert_allclose(
        M.kron_mv(A, B, x), np.kron(A, B) @ x, rtol=1e-10
    )


def test_kron_lift_matches_dense_kron():
    rng = np.random.default_rng(3)
    B = jnp.asarray(rng.normal(size=(4, 4)))
    C = jnp.asarray(rng.normal(size=(7, 3, 3)))
    got = M.kron_lift(B, C)
    want = np.stack([np.kron(np.asarray(B), np.asarray(Ct)) for Ct in C])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_lyapunov_solve():
    F = jnp.array([[0.0, 1.0], [-3.0, -2.0]])
    Qf = jnp.array([[0.0, 0.0], [0.0, 4.0]])
    P = M.lyapunov_solve(F, Qf)
    res = F @ P + P @ F.T + Qf
    np.testing.assert_allclose(res, 0.0, atol=1e-10)


def test_masked_mvn_logpdf_matches_subset():
    rng = np.random.default_rng(3)
    n = 5
    cov = rng.normal(size=(n, n))
    cov = cov @ cov.T + np.eye(n)
    mean = rng.normal(size=n)
    y = rng.normal(size=n)
    mask = np.array([1.0, 0.0, 1.0, 1.0, 0.0])
    obs = mask > 0
    from scipy.stats import multivariate_normal

    expected = multivariate_normal.logpdf(y[obs], mean[obs], cov[np.ix_(obs, obs)])
    got = G.masked_mvn_logpdf(
        jnp.asarray(y), jnp.asarray(mean), jnp.asarray(cov), jnp.asarray(mask)
    )
    # safe_cholesky's 1e-8 stabilising jitter bounds the achievable accuracy
    np.testing.assert_allclose(got, expected, rtol=1e-7)


def test_gaussian_kl_zero_and_known():
    rng = np.random.default_rng(4)
    m = jnp.asarray(rng.normal(size=3))
    Sig = rng.normal(size=(3, 3))
    Sig = Sig @ Sig.T + np.eye(3)
    L = jnp.asarray(np.linalg.cholesky(Sig))
    np.testing.assert_allclose(G.gaussian_kl(m, L, m, L), 0.0, atol=1e-10)
    # KL(N(m,S) || N(0,I)) closed form
    m2 = jnp.zeros(3)
    L2 = jnp.eye(3)
    expected = 0.5 * (
        np.trace(Sig) + m @ m - 3 - np.linalg.slogdet(Sig)[1]
    )
    np.testing.assert_allclose(G.gaussian_kl(m, L, m2, L2), expected, rtol=1e-9)
