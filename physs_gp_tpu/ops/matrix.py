"""Dense matrix primitives for the state-space GP stack.

TPU-native counterpart of the reference's `stgp/computation/matrix_ops.py:40-419`
and `computation/linalg.py:13-90`. All functions are batched (leading dims
broadcast / vmap cleanly), use no Python control flow on traced values, and
keep everything in the caller's dtype so the same code path runs fp32-on-MXU
or fp64-on-CPU (tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = [
    "highest_precision",
    "add_jitter",
    "symmetrize",
    "robust_cholesky",
    "safe_cholesky",
    "safe_cholesky_rel",
    "cholesky_solve",
    "solve_lower",
    "solve_upper",
    "gen_solve",
    "bmm",
    "psd_solve",
    "psd_solve_logdet",
    "mat_inv",
    "block_diag",
    "get_block_diagonal",
    "to_block_diag_batched",
    "diag_from_XDXT",
    "kron",
    "kron_mv",
    "lyapunov_solve",
    "project_psd",
    "log_det_from_chol",
]

def highest_precision(fn):
    """Trace `fn` under full fp32 matmul precision.

    XLA:TPU's DEFAULT dot precision feeds the MXU bfloat16 inputs — fine for
    neural nets, catastrophic for Kalman recursions (observed: NaN smoothers,
    garbage posteriors). Every filter/smoother/discretisation entry point is
    wrapped so library users get correct results without knowing the knob;
    large non-recursive Gram matmuls can still opt down locally if profiling
    ever warrants it.

    PHYSS_MATMUL_PRECISION=high opts the wrapped paths down to the 3-pass
    bf16x3 decomposition (~2^-21 effective mantissa vs 2^-24 for the 6-pass
    "highest") — measure before shipping on a new workload.
    """
    import os

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        # read per call (not at decoration time) so the env var works as the
        # runtime knob the docstring promises
        level = os.environ.get("PHYSS_MATMUL_PRECISION", "highest")
        with jax.default_matmul_precision(level):
            return fn(*args, **kwargs)

    return wrapper


DEFAULT_JITTER = None  # sentinel: pick per dtype


def default_jitter(dtype) -> float:
    """Per-dtype stabilising jitter: fp32 on the MXU needs a much larger
    floor than fp64 CPU test runs (ref: `settings.py:63-64` jitter globals)."""
    return 1e-12 if jnp.dtype(dtype).itemsize >= 8 else 1e-6


def add_jitter(A: jnp.ndarray, jitter: float | None = DEFAULT_JITTER) -> jnp.ndarray:
    if jitter is None:
        jitter = default_jitter(A.dtype)
    n = A.shape[-1]
    return A + jitter * jnp.eye(n, dtype=A.dtype)


def symmetrize(A: jnp.ndarray) -> jnp.ndarray:
    """Force symmetry (ref: `matrix_ops.py` force_symmetric)."""
    return 0.5 * (A + jnp.swapaxes(A, -1, -2))


def _cholesky_any(A: jnp.ndarray, assume_psd: bool = False) -> jnp.ndarray:
    """Batched Cholesky with closed-form n <= 2 fast paths.

    XLA's batched Cholesky on [B, 1, 1] / [B, 2, 2] runs its generic blocked
    loop — measured SECONDS at B ~ 1e5 where the closed form is a handful of
    fused elementwise ops. Scalar filters (p = 1 sites) and Matern32 states
    (d = 2) hit these shapes on every hot path.

    `assume_psd=True` additionally routes worthwhile [B, d, d] batches to
    the lane-batched Pallas Cholesky (~4.1 us/matrix XLA vs sub-us Pallas at
    d = 32; this was most of the sqrt runner's element-build time via
    `safe_cholesky_rel(Q)`). Opt-in only: the Pallas kernel pivot-floors
    instead of NaN-ing, so callers that use NaN as the indefiniteness
    signal (`robust_cholesky` escalation) must stay on the XLA path.
    """
    n = A.shape[-1]
    if n == 1:
        return jnp.sqrt(A)
    if n == 2:
        a11 = A[..., 0, 0]
        a21 = A[..., 1, 0]
        a22 = A[..., 1, 1]
        l11 = jnp.sqrt(a11)
        l21 = a21 / l11
        l22 = jnp.sqrt(jnp.maximum(a22 - l21 * l21, 0.0))
        z = jnp.zeros_like(l11)
        return jnp.stack(
            [jnp.stack([l11, z], -1), jnp.stack([l21, l22], -1)], -2
        )
    if assume_psd:
        from .pallas.batched_chol import use_pallas_chol

        if use_pallas_chol(A.shape):
            return _pallas_chol_core(A)
    return jnp.linalg.cholesky(A)


@jax.custom_vjp
def _pallas_chol_core(A):
    from .pallas.batched_chol import batch_cholesky

    return batch_cholesky(A)


def _pallas_chol_fwd(A):
    return _pallas_chol_core(A), A


def _pallas_chol_bwd(A, ct):
    # recompute through XLA's differentiable Cholesky (same factor for PD
    # inputs; the Pallas forward only differs on floored pivots, where the
    # caller has already jittered)
    _, vjp = jax.vjp(jnp.linalg.cholesky, A)
    return vjp(ct)


_pallas_chol_core.defvjp(_pallas_chol_fwd, _pallas_chol_bwd)


def safe_cholesky(A: jnp.ndarray, jitter: float | None = DEFAULT_JITTER) -> jnp.ndarray:
    """Cholesky of A + jitter*I, symmetrized first."""
    return _cholesky_any(add_jitter(symmetrize(A), jitter), assume_psd=True)


def safe_cholesky_rel(A: jnp.ndarray, rel: float | None = None) -> jnp.ndarray:
    """Cholesky with RELATIVE jitter plus a tiny absolute floor.

    Differentiable everywhere (unlike eigh-based PSD square roots, whose
    gradients are NaN for degenerate spectra like sigma^2 * I), and well
    defined for exactly-zero matrices (e.g. Q(dt=0)): chol(floor * I) is a
    negligible multiple of I.
    """
    if rel is None:
        rel = default_jitter(A.dtype)
    scale = jnp.max(jnp.abs(jnp.diagonal(A, axis1=-2, axis2=-1)), -1)
    eps = rel * scale + 1e-30  # absolute floor keeps chol(0) finite
    n = A.shape[-1]
    return _cholesky_any(
        symmetrize(A) + eps[..., None, None] * jnp.eye(n, dtype=A.dtype),
        assume_psd=True,
    )


def robust_cholesky(A: jnp.ndarray, rel: float | None = None,
                    escalations=(1e2, 1e3, 1e4)) -> jnp.ndarray:
    """Cholesky with per-batch-element ESCALATING relative jitter.

    For projected block covariances S = H P H^T whose heads are nearly
    linearly dependent (collocation heads interpolated from grid heads),
    fp32 smoother error makes S indefinite by ~1e-4 relative — beyond any
    fixed jitter that wouldn't distort well-conditioned blocks. Probe
    factorisations at rel * {1, *escalations} under stop_gradient find, per
    batch element, the smallest level that is finite; ONE real Cholesky then
    runs at that level. Gradients flow through a single PD factorisation —
    no NaN branches to double-where away (CLAUDE.md rule 4).

    Used by the MC sampling paths (`NonlinearResidual._samples`,
    `DynamicCovarianceGaussian`) — the reference sidesteps this class of
    failure by running fp64 (`computation/integrals/samples.py` chols the
    block covariance directly).
    """
    if rel is None:
        rel = default_jitter(A.dtype)
    A = symmetrize(A)
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    scale = jnp.max(jnp.abs(jnp.diagonal(A, axis1=-2, axis2=-1)), -1)
    scale = scale[..., None, None] + 1e-30

    A_probe = jax.lax.stop_gradient(A)
    levels = (1.0,) + tuple(escalations)
    # smallest level whose probe factorisation is finite, per batch element
    # (scan high->low: a finite smaller level overwrites); elements bad at
    # every probed level fall through to the highest level unprobed.
    mult = jnp.full_like(scale, levels[-1])
    for lv in reversed(levels[:-1]):
        L = _cholesky_any(A_probe + (rel * lv) * scale * eye)
        good = jnp.all(jnp.isfinite(L), axis=(-2, -1), keepdims=True)
        mult = jnp.where(good, lv, mult)
    return _cholesky_any(A + (rel * mult) * scale * eye)


def solve_lower(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    n = L.shape[-1]
    if n == 1:
        return B / L[..., 0:1, 0:1]
    if n == 2:
        x0 = B[..., 0, :] / L[..., 0:1, 0]
        x1 = (B[..., 1, :] - L[..., 1:2, 0] * x0) / L[..., 1:2, 1]
        return jnp.stack([x0, x1], axis=-2)
    return solve_triangular(L, B, lower=True)


def solve_upper(U: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    n = U.shape[-1]
    if n == 1:
        return B / U[..., 0:1, 0:1]
    if n == 2:
        x1 = B[..., 1, :] / U[..., 1:2, 1]
        x0 = (B[..., 0, :] - U[..., 0:1, 1] * x1) / U[..., 0:1, 0]
        return jnp.stack([x0, x1], axis=-2)
    return solve_triangular(U, B, lower=False)


def cholesky_solve(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B given L = chol(A) (lower)."""
    return solve_upper(jnp.swapaxes(L, -1, -2), solve_lower(L, B))


def mat_inv(A: jnp.ndarray, jitter: float = DEFAULT_JITTER) -> jnp.ndarray:
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    return psd_solve(A, eye, jitter)


# ---------------------------------------------------------------------------
# Batched SPD solves with a Pallas fast path.
#
# XLA's batched small-matrix cholesky/triangular-solve run d sequential steps
# of lane-wasteful [B, d, d] updates — measured ~10x off attainable speed for
# the filter's [T, 32, 32] blocks. The lane-batched Gauss-Jordan kernels
# (ops/pallas/batched_linalg.py) do the whole solve in one VMEM-resident pass.
# custom_vjp (solve calculus: dX = A^-1 (dB - dA X), dlogdet = tr(A^-1 dA))
# both keeps reverse-mode AD working through the Pallas call and is cheaper
# than differentiating a factorization.
# ---------------------------------------------------------------------------


def _psd_solve_primal(A, B):
    from .pallas.batched_linalg import batch_solve, use_pallas_linalg

    if use_pallas_linalg(A.shape) and B.ndim == 3:
        return batch_solve(A, B)
    return cholesky_solve(_cholesky_any(A), B)


def _psd_solve_logdet_primal(A, B):
    from .pallas.batched_linalg import batch_solve_logdet, use_pallas_linalg

    if use_pallas_linalg(A.shape) and B.ndim == 3:
        return batch_solve_logdet(A, B)
    L = _cholesky_any(A)
    return cholesky_solve(L, B), log_det_from_chol(L)


@jax.custom_vjp
def _psd_solve(A, B):
    return _psd_solve_primal(A, B)


def _psd_solve_fwd(A, B):
    X = _psd_solve_primal(A, B)
    return X, (A, X)


def _psd_solve_bwd(res, ct):
    A, X = res
    W = _psd_solve_primal(A, ct)  # A symmetric: A^-T = A^-1
    A_bar = -jnp.einsum("...ir,...jr->...ij", W, X)
    return A_bar, W


_psd_solve.defvjp(_psd_solve_fwd, _psd_solve_bwd)


@jax.custom_vjp
def _psd_solve_logdet(A, B):
    return _psd_solve_logdet_primal(A, B)


def _psd_solve_logdet_fwd(A, B):
    X, ld = _psd_solve_logdet_primal(A, B)
    return (X, ld), (A, X)


def _psd_solve_logdet_bwd(res, cts):
    A, X = res
    ct_X, ct_ld = cts
    eye = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    rhs = jnp.concatenate([ct_X, eye], axis=-1)
    sol = _psd_solve_primal(A, rhs)
    W, Ainv = sol[..., : ct_X.shape[-1]], sol[..., ct_X.shape[-1] :]
    A_bar = -jnp.einsum("...ir,...jr->...ij", W, X)
    A_bar = A_bar + ct_ld[..., None, None] * Ainv
    return A_bar, W


_psd_solve_logdet.defvjp(_psd_solve_logdet_fwd, _psd_solve_logdet_bwd)


def _gen_solve_primal(A, B):
    from .pallas.batched_linalg import batch_solve, use_pallas_linalg

    if use_pallas_linalg(A.shape) and B.ndim == 3:
        return batch_solve(A, B)
    return jnp.linalg.solve(A, B)


@jax.custom_vjp
def gen_solve(A, B):
    """Differentiable batched solve for GENERAL (non-symmetric) well-
    conditioned A — e.g. the filtering combine's identity-dominated
    (I + C J). Pallas Gauss-Jordan on TPU, LU fallback elsewhere."""
    return _gen_solve_primal(A, B)


def _gen_solve_fwd(A, B):
    X = _gen_solve_primal(A, B)
    return X, (A, X)


def _gen_solve_bwd(res, ct):
    A, X = res
    W = _gen_solve_primal(jnp.swapaxes(A, -1, -2), ct)
    A_bar = -jnp.einsum("...ir,...jr->...ij", W, X)
    return A_bar, W


gen_solve.defvjp(_gen_solve_fwd, _gen_solve_bwd)


# ---------------------------------------------------------------------------
# Batched small-matrix multiply with a lane-batched Pallas fast path.
#
# XLA's batched dot at [B, 32, 32] measures 152 ns/matrix (0.43 TFLOP/s);
# the lane-batched kernel measures 95 ns including its layout transposes,
# and its in-kernel transposes are free — so every `swapaxes`-then-matmul in
# the combines disappears too. Custom VJP keeps reverse-mode AD working by
# expressing each cotangent as another bmm.
# ---------------------------------------------------------------------------


def _bmm_primal(A, B, ta, tb):
    from .pallas.batched_linalg import batch_bmm, use_pallas_linalg

    if (
        A.ndim == 3
        and B.ndim == 3
        and A.shape[0] == B.shape[0]  # no broadcasting in the kernel
        and use_pallas_linalg(A.shape)
        and B.shape[-1] <= 40
        and B.shape[-2] <= 40
    ):
        return batch_bmm(A, B, ta=ta, tb=tb)
    a = jnp.swapaxes(A, -1, -2) if ta else A
    b = jnp.swapaxes(B, -1, -2) if tb else B
    return jnp.einsum("...ij,...jk->...ik", a, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bmm(A, B, ta: bool = False, tb: bool = False):
    """op(A) @ op(B) batched over the leading axis; op = T when ta/tb."""
    return _bmm_primal(A, B, ta, tb)


def _bmm_fwd(A, B, ta, tb):
    return _bmm_primal(A, B, ta, tb), (A, B)


def _unbroadcast_to(x, shape):
    """Sum cotangent over dims the primal broadcast (custom_vjp requires
    exact shape match; combines broadcast a [1, d, d] carry over a chunk)."""
    if x.shape == shape:
        return x
    ndiff = x.ndim - len(shape)
    if ndiff:
        x = jnp.sum(x, axis=tuple(range(ndiff)))
    axes = tuple(
        i for i, (a, b) in enumerate(zip(x.shape, shape)) if b == 1 and a != 1
    )
    if axes:
        x = jnp.sum(x, axis=axes, keepdims=True)
    return x


def _bmm_bwd(ta, tb, res, ct):
    A, B = res
    # C = opA(A) opB(B):
    #   d/dA: (F,*) -> unopB(ct opB(B)^T) ; (T,*) -> opB(B) ct^T
    if not ta:
        dA = _bmm_primal(ct, B, False, not tb)
    else:
        dA = _bmm_primal(B, ct, tb, True)
    if not tb:
        dB = _bmm_primal(A, ct, not ta, False)
    else:
        dB = _bmm_primal(ct, A, True, ta)
    return _unbroadcast_to(dA, A.shape), _unbroadcast_to(dB, B.shape)


bmm.defvjp(_bmm_fwd, _bmm_bwd)


def psd_solve(A: jnp.ndarray, B: jnp.ndarray,
              jitter: float | None = DEFAULT_JITTER) -> jnp.ndarray:
    """Solve (sym(A) + jitter I) X = B for batched SPD A.

    Pallas lane-batched Gauss-Jordan on TPU for [B >= 256, d <= 40, d]
    shapes, batched-cholesky fallback elsewhere; differentiable via the
    solve-calculus custom VJP either way."""
    return _psd_solve(add_jitter(symmetrize(A), jitter), B)


def psd_solve_logdet(A: jnp.ndarray, B: jnp.ndarray,
                     jitter: float | None = DEFAULT_JITTER):
    """(X, log det) of the jittered SPD solve — one fused pass on TPU
    (replaces cholesky + 2 triangular solves + log-diag reduction in the
    masked Gaussian logpdfs)."""
    return _psd_solve_logdet(add_jitter(symmetrize(A), jitter), B)


def block_diag(*blocks: jnp.ndarray) -> jnp.ndarray:
    """Dense block-diagonal assembly of differently-sized (possibly
    rectangular) blocks."""
    blocks = [jnp.atleast_2d(b) for b in blocks]
    m = sum(b.shape[-2] for b in blocks)
    n = sum(b.shape[-1] for b in blocks)
    dtype = jnp.result_type(*blocks)
    out = jnp.zeros(blocks[0].shape[:-2] + (m, n), dtype)
    i = j = 0
    for b in blocks:
        r, c = b.shape[-2:]
        out = out.at[..., i : i + r, j : j + c].set(b)
        i += r
        j += c
    return out


def to_block_diag_batched(blocks: jnp.ndarray) -> jnp.ndarray:
    """[B, k, k] stacked blocks -> [B*k, B*k] block-diagonal (ref: to_block_diag)."""
    B, k, _ = blocks.shape
    out = jnp.zeros((B, k, B, k), blocks.dtype)
    idx = jnp.arange(B)
    out = out.at[idx, :, idx, :].set(blocks)
    return out.reshape(B * k, B * k)


def get_block_diagonal(A: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """[..., B*k, B*k] -> [..., B, k, k] diagonal blocks (ref: get_block_diagonal)."""
    n = A.shape[-1]
    B = n // block_size
    A4 = A.reshape(A.shape[:-2] + (B, block_size, B, block_size))
    return jnp.einsum("...ikil->...ikl", A4)


def diag_from_XDXT(X: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
    """diag(X D X^T) without materializing the full product
    (ref: `matrix_ops.py` diagonal_from_XDXT)."""
    return jnp.einsum("...ij,...jk,...ik->...i", X, D, X)


def kron(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched Kronecker product: [..., m, n] x [..., p, q] -> [..., mp, nq]."""
    m, n = A.shape[-2:]
    p, q = B.shape[-2:]
    out = A[..., :, None, :, None] * B[..., None, :, None, :]
    return out.reshape(out.shape[:-4] + (m * p, n * q))


def kron_lift(B: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    """kron(B, C) for STATIC B [m, m] and batched C [T, n, n] → [T, mn, mn].

    Tile/repeat formulation: out[t, i·n+a, j·n+b] = B[i, j] · C[t, a, b],
    i.e. `repeat(B)[None] * tile(C)` — both lower to broadcast+reshape (no
    gather; XLA:TPU gathers at [T, mn, mn] measured 1.5x slower than the
    tile lowering). The naive broadcast kron materialises a
    [T, m, n, m, n] intermediate whose trailing n (= temporal state dim,
    typically 2-3) gets padded to the 128-lane TPU tile — a 64x memory
    blowup that OOMs compilation at T = 100k (26 GB for a 410 MB tensor).
    Expanding C straight to [T, mn, mn] keeps every tensor lane-sized.
    """
    m = B.shape[-1]
    n = C.shape[-1]
    Bg = jnp.repeat(jnp.repeat(B, n, axis=-2), n, axis=-1)  # [mn, mn]
    Cg = jnp.tile(C, (1, m, m))  # [T, mn, mn]
    return Bg[None] * Cg


def kron_mv(A: jnp.ndarray, B: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(A ⊗ B) x computed as B X A^T without forming the Kronecker product.

    A: [m, m], B: [p, p], x: [..., m*p]. The reshape maps index i*p+j so the
    Kronecker convention matches `kron(A, B)`.
    """
    m = A.shape[-1]
    p = B.shape[-1]
    X = x.reshape(x.shape[:-1] + (m, p))
    Y = jnp.einsum("ab,...bc,dc->...ad", A, X, B)
    return Y.reshape(x.shape)


def lyapunov_solve(F: jnp.ndarray, Qc_full: jnp.ndarray) -> jnp.ndarray:
    """Solve F P + P F^T + Qc_full = 0 for the stationary covariance P.

    Used to derive P_inf of Markov kernels generically (the reference hardcodes
    per-kernel closed forms in `kernels/ss_utils.py:13`). State dims here are
    tiny (d <= ~8), so the d^2 x d^2 vec-trick solve is negligible and done
    once per trace.
    """
    d = F.shape[-1]
    eye = jnp.eye(d, dtype=F.dtype)
    M = kron(eye, F) + kron(F, eye)
    vecP = jnp.linalg.solve(M, -Qc_full.reshape(F.shape[:-2] + (d * d, 1)))
    return symmetrize(vecP.reshape(F.shape[:-2] + (d, d)))


def project_psd(A: jnp.ndarray, min_eig: float = 0.0) -> jnp.ndarray:
    """Eigenvalue-clipped PSD projection (ref: parameter_transforms retraction)."""
    A = symmetrize(A)
    w, V = jnp.linalg.eigh(A)
    w = jnp.clip(w, min_eig, None)
    return jnp.einsum("...ij,...j,...kj->...ik", V, w, V)


def log_det_from_chol(L: jnp.ndarray) -> jnp.ndarray:
    return 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(L, axis1=-2, axis2=-1))), -1)
