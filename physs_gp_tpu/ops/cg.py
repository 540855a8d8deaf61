"""Iterative SPD solves: batched preconditioned conjugate gradients and
stochastic Lanczos quadrature log-determinants.

TPU-native counterpart of the reference's iterative solver path
(`/root/reference/src/lib/stgp/computation/linalg.py:13-90`, dispatched by
`settings.linear_solver` ∈ {CHOLESKY, CG, EXACT}). The reference calls
unpreconditioned `jax.scipy.sparse.linalg.cg` per solve and — in CG mode —
computes log-determinants by a FULL eigendecomposition (O(n^3), defeating the
iterative point). Here instead:

- `cg_solve`: Jacobi-preconditioned CG with a FIXED trip count under
  `lax.scan` (static shapes — no data-dependent while_loop under jit on TPU)
  and per-column convergence freezing, batched over leading dims and over
  multiple right-hand sides in one pass (each matvec is one big MXU matmul).
  Gradients come from `lax.custom_linear_solve` (implicit function theorem:
  the backward pass is ONE more CG solve, never differentiating through the
  iterations).
- `slq_logdet`: Hutchinson + stochastic Lanczos quadrature — m Lanczos steps
  (full reorthogonalisation; m is small) on k Rademacher probes, eigh of the
  small [m, m] tridiagonal, logdet ≈ n · mean_j Σ_i τ_ji² log θ_ji. O(k·m)
  matvecs instead of the reference's O(n³) eigh. The VJP reuses
  d logdet = tr(A⁻¹ dA) with the SAME probes and CG solves (unbiased,
  matching the estimator's own noise floor).

When to use — MEASURED on one v5e chip (fp32 RBF, in-graph K-loop timing;
`scripts/profile/bench_cg.py` → `results/cg_crossover.json`,
docs/PERFORMANCE.md "CG vs Cholesky at design scale"): CG is the
MEMORY-bound escape hatch, not a one-chip speed lever. It halves peak temp
memory at every n (0.7/65/513 MB vs 1.2/195/1032 MB at n = 2k/4k/8k) — at
n = 16384 the Cholesky arm's ~4 GB grad graph crashes the TPU worker while
CG still fits. For training, Cholesky wins wall-clock at every reachable n
(its lml is launch-overhead-flat at ~45-60 ms across 2k-8k; CG's gradient
— implicit-diff backward + per-probe SLQ re-solves — runs 3-7x its own
forward). CG's forward alone wins below n ≈ 3k (26 vs 50 ms at n = 2048).
lml agreement vs Cholesky ≤ 1.7e-3 relative at the default (probes=32,
iters=48) budget. `models.BatchGP(solver="cg")` flips the whole exact-GP
path onto this module.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .matrix import DEFAULT_JITTER, add_jitter, highest_precision, symmetrize

__all__ = ["cg_solve", "slq_logdet", "solve", "log_determinant"]


def _dot_cols(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-column inner products: [..., n, k] x2 -> [..., 1, k]."""
    return jnp.sum(a * b, axis=-2, keepdims=True)


def _safe_div(num: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    """num/den with 0 where |den| underflows (double-where: NaN-free grad)."""
    tiny = jnp.asarray(1e-30 if num.dtype == jnp.float64 else 1e-20, num.dtype)
    ok = jnp.abs(den) > tiny
    den_safe = jnp.where(ok, den, 1.0)
    return jnp.where(ok, num / den_safe, 0.0)


def _pcg(matvec, B, minv_diag, maxiter: int, tol: float):
    """Preconditioned CG on [..., n, k] right-hand sides, fixed trip count.

    Every column runs its own CG (scalar alpha/beta per column); converged
    columns freeze via masks so extra iterations are no-ops, keeping the
    trip count static for XLA. `minv_diag` [..., n, 1] is the Jacobi
    preconditioner's diagonal inverse (ones = unpreconditioned)."""
    normB = jnp.sqrt(_dot_cols(B, B))
    thresh = tol * jnp.maximum(normB, jnp.asarray(1e-30, B.dtype))

    x0 = jnp.zeros_like(B)
    r0 = B
    z0 = minv_diag * r0
    rz0 = _dot_cols(r0, z0)

    def step(carry, _):
        x, r, p, rz = carry
        active = jnp.sqrt(_dot_cols(r, r)) > thresh
        Ap = matvec(p)
        alpha = jnp.where(active, _safe_div(rz, _dot_cols(p, Ap)), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z_new = minv_diag * r
        rz_new = _dot_cols(r, z_new)
        beta = jnp.where(active, _safe_div(rz_new, rz), 0.0)
        p = z_new + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = lax.scan(
        step, (x0, r0, z0, rz0), None, length=maxiter
    )
    return x


@partial(jax.jit, static_argnames=("precond", "maxiter", "tol", "jitter"))
@highest_precision
def cg_solve(
    A: jnp.ndarray,
    B: jnp.ndarray,
    *,
    jitter: float | None = DEFAULT_JITTER,
    precond: str | None = "jacobi",
    tol: float = 1e-6,
    maxiter: int | None = None,
) -> jnp.ndarray:
    """Solve (sym(A) + jitter I) X = B for batched dense SPD A by PCG.

    A [..., n, n]; B [..., n] or [..., n, k] (all k columns solved in one
    pass — the matvec is a single batched matmul, so multi-RHS rides the
    MXU). Differentiable in A and B via `lax.custom_linear_solve`
    (symmetric): the backward pass is one more CG solve against the same A.
    """
    vector_rhs = B.ndim == A.ndim - 1
    if vector_rhs:
        B = B[..., None]
    n = A.shape[-1]
    if maxiter is None:
        maxiter = n
    Aj = add_jitter(symmetrize(A), jitter)
    if precond == "jacobi":
        d = jnp.diagonal(Aj, axis1=-2, axis2=-1)[..., None]  # [..., n, 1]
        minv = _safe_div(jnp.ones_like(d), d)
    elif precond is None:
        minv = jnp.ones_like(Aj[..., :1])
    else:  # pragma: no cover - guarded by tests
        raise ValueError(f"unknown preconditioner {precond!r}")

    def mv(x):
        return Aj @ x

    X = lax.custom_linear_solve(
        mv,
        B,
        solve=lambda _mv, b: _pcg(mv, b, minv, maxiter, tol),
        symmetric=True,
    )
    return X[..., 0] if vector_rhs else X


def _lanczos(matvec, z, m: int):
    """m-step Lanczos with full reorthogonalisation.

    z [..., n] start vector. Returns (alphas [..., m], betas [..., m-1]) of
    the tridiagonal T. Full reorth (two passes of classical Gram-Schmidt
    against the stored basis) — m is small (≤ ~64), so the [m, n] basis and
    the O(m²n) reorth are cheap next to losing orthogonality, which makes
    SLQ see ghost eigenvalues."""
    n = z.shape[-1]
    dtype = z.dtype
    z0 = z / jnp.sqrt(jnp.sum(z * z, axis=-1, keepdims=True))
    V = jnp.zeros(z.shape[:-1] + (m, n), dtype).at[..., 0, :].set(z0)

    def reorth(w, V, j_mask):
        # subtract projections onto the basis rows built so far (masked)
        c = jnp.einsum("...mn,...n->...m", V, w) * j_mask
        return w - jnp.einsum("...m,...mn->...n", c, V)

    def step(carry, j):
        V, v_prev, v, beta_prev = carry
        w = matvec(v)
        alpha = jnp.sum(w * v, axis=-1)
        w = w - alpha[..., None] * v - beta_prev[..., None] * v_prev
        j_mask = (jnp.arange(m, dtype=dtype) <= j).astype(dtype)
        w = reorth(w, V, j_mask)
        w = reorth(w, V, j_mask)  # second pass: "twice is enough"
        beta = jnp.sqrt(jnp.sum(w * w, axis=-1))
        v_next = _safe_div(w, beta[..., None])
        write = jnp.minimum(j + 1, m - 1)
        V = jnp.where(j + 1 < m, V.at[..., write, :].set(v_next), V)
        return (V, v, v_next, beta), (alpha, beta)

    carry = (V, jnp.zeros_like(z0), z0, jnp.zeros(z.shape[:-1], dtype))
    _, (alphas, betas) = lax.scan(step, carry, jnp.arange(m))
    # scan stacks along axis 0 — move the iteration axis last
    alphas = jnp.moveaxis(alphas, 0, -1)  # [..., m]
    betas = jnp.moveaxis(betas, 0, -1)[..., : m - 1]  # [..., m-1]
    return alphas, betas


def _slq_estimate(A, z, m: int):
    """Hutchinson+SLQ estimate of logdet(A) from Rademacher probes
    z [..., k, n]: returns [...] for A [..., n, n]."""
    n = A.shape[-1]
    dtype = A.dtype

    def mv(x):  # [..., k, n] -> [..., k, n]
        return jnp.einsum("...ij,...kj->...ki", A, x)

    alphas, betas = _lanczos(mv, z, m)  # [..., k, m], [..., k, m-1]
    betas_p = jnp.pad(betas, [(0, 0)] * (betas.ndim - 1) + [(0, 1)])
    off = jnp.einsum(
        "...i,ij->...ij", betas_p, jnp.eye(m, k=1, dtype=dtype)
    )
    T = (
        jnp.einsum("...i,ij->...ij", alphas, jnp.eye(m, dtype=dtype))
        + off
        + jnp.swapaxes(off, -1, -2)
    )
    theta, U = jnp.linalg.eigh(T)  # [..., k, m], [..., k, m, m]
    tau2 = U[..., 0, :] ** 2  # first-row weights
    floor = jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-20, dtype)
    quad = jnp.sum(tau2 * jnp.log(jnp.maximum(theta, floor)), axis=-1)
    return n * jnp.mean(quad, axis=-1)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _slq_logdet_core(A, z, m, tol, maxiter):
    return _slq_estimate(A, z, m)


def _slq_fwd(A, z, m, tol, maxiter):
    return _slq_estimate(A, z, m), (A, z)


def _slq_bwd(m, tol, maxiter, res, ct):
    A, z = res
    n_probes = z.shape[-2]
    # d logdet = tr(A^-1 dA) ≈ mean_j z_j^T A^-1 dA z_j  (Rademacher probes)
    # => A_bar = ct * mean_j w_j z_j^T with w_j = A^-1 z_j (CG solves).
    W = cg_solve(
        A,
        jnp.swapaxes(z, -1, -2),  # [..., n, k]
        jitter=0.0,
        tol=tol,
        maxiter=maxiter,
    )
    Abar = jnp.einsum(
        "...ik,...kj->...ij", W, z
    ) / n_probes  # mean_j w_j z_j^T
    # the true gradient A^-1 is symmetric: symmetrising the estimate is
    # free unbiased variance reduction (~2x on off-diagonal entries)
    Abar = 0.5 * (Abar + jnp.swapaxes(Abar, -1, -2))
    ct_ = ct[..., None, None] if jnp.ndim(ct) else ct
    return (ct_ * Abar, jnp.zeros_like(z))


_slq_logdet_core.defvjp(_slq_fwd, _slq_bwd)


@highest_precision
def slq_logdet(
    A: jnp.ndarray,
    key: jax.Array,
    *,
    jitter: float | None = DEFAULT_JITTER,
    n_probes: int = 16,
    lanczos_iters: int = 32,
    tol: float = 1e-6,
    maxiter: int | None = None,
) -> jnp.ndarray:
    """Stochastic logdet(sym(A) + jitter I) for batched SPD A [..., n, n].

    Unbiased over `key`, deterministic given it. O(n_probes · lanczos_iters)
    matvecs; the VJP is `n_probes` CG solves on the same probes (the
    reference's CG-mode logdet is a full eigh — O(n³) forward, undefined
    backward; `linalg.py:77-80`)."""
    n = A.shape[-1]
    m = min(lanczos_iters, n)
    Aj = add_jitter(symmetrize(A), jitter)
    z = jax.random.rademacher(
        key, A.shape[:-2] + (n_probes, n), dtype=Aj.dtype
    )
    return _slq_logdet_core(
        Aj, z, m, tol, n if maxiter is None else maxiter
    )


def solve(A, B, method: str = "cholesky", **kw):
    """Reference-shaped solver dispatch (`linalg.py:13-46`): method ∈
    {"cholesky", "cg", "exact"} — but static-argument, not a global mutable
    setting, so jit caches stay sound."""
    if method == "cholesky":
        from .matrix import psd_solve

        vec = B.ndim == A.ndim - 1
        X = psd_solve(A, B[..., None] if vec else B, **kw)
        return X[..., 0] if vec else X
    if method == "cg":
        return cg_solve(A, B, **kw)
    if method == "exact":
        return jnp.linalg.solve(
            add_jitter(symmetrize(A), kw.get("jitter", DEFAULT_JITTER)), B
        )
    raise ValueError(f"unknown solve method {method!r}")


def log_determinant(A, method: str = "cholesky", key=None, **kw):
    """Reference-shaped logdet dispatch (`linalg.py:68-85`). "slq" replaces
    the reference's CG-mode full-eigh with stochastic Lanczos quadrature
    (pass `key`)."""
    if method == "cholesky":
        from .matrix import log_det_from_chol, safe_cholesky

        return log_det_from_chol(
            safe_cholesky(A, kw.get("jitter", DEFAULT_JITTER))
        )
    if method in ("slq", "cg"):
        if key is None:
            raise ValueError("slq logdet needs an explicit PRNG key")
        return slq_logdet(A, key, **kw)
    if method == "exact":
        return jnp.linalg.slogdet(
            add_jitter(symmetrize(A), kw.get("jitter", DEFAULT_JITTER))
        )[1]
    raise ValueError(f"unknown logdet method {method!r}")
