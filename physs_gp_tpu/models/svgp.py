"""Dense (sparse) variational GP with a free-form Gaussian posterior.

TPU-native counterpart of the reference's `VGP` with free-form
`GaussianApproximatePosterior` + `FullSparsity` inducing points
(`models/vgp.py:27`, `approximate_posteriors/gaussian_approximate_posterior.py:11`,
whitened marginals `computation/elbos/variational_params.py`): the classic
(S)VGP — q(u) = N(m, L L^T) at inducing inputs Z, whitened by default, ELBO =
sum_i ELL_i - KL(q || p), everything one jitted graph of dense MXU matmuls.

Used by the reference's batch-VI diff-GP variants (`zoo/diff.py`): with a
DerivativeKernel prior this is the AutoIP-style physics model.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..likelihoods.nongaussian import expected_log_lik
from ..ops.gaussian import gaussian_kl
from ..ops.matrix import (
    default_jitter,
    diag_from_XDXT,
    highest_precision,
    safe_cholesky,
    safe_cholesky_rel,
    solve_lower,
)
from ..utils.params import Param, fill_triangular, param, tril_param
from ..utils.struct import module, replace, static
from .ssgp import GaussianMoments

__all__ = ["SVGP"]


def _chol_gram(K):
    """Cholesky of an inducing Gram with fp32-adequate RELATIVE jitter
    (dense smooth kernels are near-singular; absolute 1e-6 is not enough
    in fp32 once lengthscales grow during training)."""
    return safe_cholesky_rel(K, rel=100.0 * default_jitter(K.dtype))


@module
class SVGP:
    X: jnp.ndarray  # [N, D] training inputs
    Y: jnp.ndarray  # [N, P] observations (NaN = missing)
    Z: jnp.ndarray  # [M, D] inducing inputs (trainable when traced)
    kernel: object
    likelihood: object
    q_mu: Param  # [M*P]
    q_sqrt: Param  # packed tril [M*P (M*P+1)/2]
    whiten: bool = static(default=True)

    @classmethod
    def init(cls, X, Y, Z, kernel, likelihood, whiten=True):
        from ..utils.shapes import as_points

        X, Y = as_points(X), as_points(Y)
        Z = as_points(Z, D=X.shape[-1], what="inducing inputs Z")
        P = getattr(kernel, "n_outputs", 1)
        M = Z.shape[0] * P
        return cls(
            X=X, Y=Y, Z=Z, kernel=kernel, likelihood=likelihood,
            q_mu=param(jnp.zeros(M)),
            q_sqrt=tril_param(jnp.eye(M)),
            whiten=whiten,
        )

    # ---- internals ----
    def _as_points(self, Xs):
        from ..utils.shapes import as_points

        return as_points(Xs, D=self.X.shape[-1] if self.X.ndim > 1 else 1)

    @property
    def _M(self) -> int:
        return self.Z.shape[0] * getattr(self.kernel, "n_outputs", 1)

    def _q(self):
        m = self.q_mu.value
        L = fill_triangular(self.q_sqrt.value, self._M)
        return m, L

    def _marginals(self, Xs):
        """q(f) at Xs: mean [Ns*P], var [Ns*P] (data-major)."""
        Kzz = self.kernel.K(self.Z, self.Z)
        Lz = _chol_gram(Kzz)
        Kzx = self.kernel.K(self.Z, Xs)
        A = solve_lower(Lz, Kzx)  # [M, Ns*P]
        m, L = self._q()
        kd = self.kernel.K_diag(Xs)
        if self.whiten:
            mean = A.T @ m
            SA = L.T @ A
            var = kd - jnp.sum(A * A, 0) + jnp.sum(SA * SA, 0)
        else:
            B = jax.scipy.linalg.solve_triangular(Lz.T, A, lower=False)
            mean = B.T @ m
            SB = L.T @ B
            var = kd - jnp.sum(A * A, 0) + jnp.sum(SB * SB, 0)
        return mean, jnp.maximum(var, 1e-12)

    # ---- public API ----
    @highest_precision
    def elbo(self) -> jnp.ndarray:
        mean, var = self._marginals(self.X)
        P = getattr(self.kernel, "n_outputs", 1)
        yf = self.Y.reshape(-1)
        ell = jnp.sum(expected_log_lik(self.likelihood, yf, mean, var))
        m, L = self._q()
        M = self._M
        if self.whiten:
            kl = gaussian_kl(m, L, jnp.zeros(M), jnp.eye(M, dtype=L.dtype))
        else:
            Lz = _chol_gram(self.kernel.K(self.Z, self.Z))
            kl = gaussian_kl(m, L, jnp.zeros(M), Lz)
        return ell - kl

    def get_objective(self) -> jnp.ndarray:
        return -self.elbo()

    # ---- free-form natural gradients (ref `nat_grad.py:30-408`) ----
    def _elbo_mS(self, m, S):
        """ELBO as a function of the raw (m, S) posterior moments."""
        Ls = safe_cholesky(S)
        Kzz = self.kernel.K(self.Z, self.Z)
        Lz = _chol_gram(Kzz)
        Kzx = self.kernel.K(self.Z, self.X)
        A = solve_lower(Lz, Kzx)
        kd = self.kernel.K_diag(self.X)
        if self.whiten:
            mean = A.T @ m
            var = kd - jnp.sum(A * A, 0) + diag_from_XDXT(A.T, S)
            kl = gaussian_kl(
                m, Ls, jnp.zeros_like(m), jnp.eye(m.shape[0], dtype=S.dtype)
            )
        else:
            B = jax.scipy.linalg.solve_triangular(Lz.T, A, lower=False)
            mean = B.T @ m
            var = kd - jnp.sum(A * A, 0) + diag_from_XDXT(B.T, S)
            kl = gaussian_kl(m, Ls, jnp.zeros_like(m), Lz)
        yf = self.Y.reshape(-1)
        ell = jnp.sum(
            expected_log_lik(self.likelihood, yf, mean, jnp.maximum(var, 1e-12))
        )
        return ell - kl

    @highest_precision
    def natural_gradient_update(self, lr: float) -> "SVGP":
        """Exponential-family natural-gradient step on (q_mu, q_sqrt):
        lambda <- lambda + lr * dELBO/d(expectation params). With a conjugate
        (Gaussian) likelihood and lr = 1 this reaches the optimum in ONE step.
        """
        m, L = self._q()
        S = L @ L.T
        g1, g2 = jax.grad(self._elbo_mS, argnums=(0, 1))(m, S)
        g2 = 0.5 * (g2 + g2.T)
        Sinv = jax.scipy.linalg.cho_solve(
            (safe_cholesky(S), True), jnp.eye(S.shape[0], dtype=S.dtype)
        )
        lam1 = Sinv @ m
        lam2 = -0.5 * Sinv
        lam1_new = lam1 + lr * (g1 - 2.0 * g2 @ m)
        lam2_new = lam2 + lr * g2
        prec_new = -2.0 * lam2_new
        Lp = safe_cholesky(prec_new)
        S_new = jax.scipy.linalg.cho_solve(
            (Lp, True), jnp.eye(S.shape[0], dtype=S.dtype)
        )
        m_new = S_new @ lam1_new
        from ..utils.params import fill_triangular_inverse

        return replace(
            self,
            q_mu=replace(self.q_mu, raw=m_new),
            q_sqrt=replace(
                self.q_sqrt,
                raw=fill_triangular_inverse(safe_cholesky(S_new)),
            ),
        )

    def predict_f(self, Xs) -> GaussianMoments:
        mean, var = highest_precision(self._marginals)(self._as_points(Xs))
        P = getattr(self.kernel, "n_outputs", 1)
        return GaussianMoments(mean=mean.reshape(-1, P), var=var.reshape(-1, P))

    @highest_precision
    def _joint(self, Xs):
        """q(f) at Xs with the FULL [Ns*P, Ns*P] covariance."""
        Kzz = self.kernel.K(self.Z, self.Z)
        Lz = _chol_gram(Kzz)
        Kzx = self.kernel.K(self.Z, Xs)
        A = solve_lower(Lz, Kzx)
        m, L = self._q()
        Kss = self.kernel.K(Xs, Xs)
        if self.whiten:
            mean = A.T @ m
            SA = L.T @ A
            cov = Kss - A.T @ A + SA.T @ SA
        else:
            B = jax.scipy.linalg.solve_triangular(Lz.T, A, lower=False)
            mean = B.T @ m
            SB = L.T @ B
            cov = Kss - A.T @ A + SB.T @ SB
        return mean, cov

    def sample_f(self, key, Xs, n_samples: int) -> jnp.ndarray:
        """JOINT q(f) samples [S, Ns, P] at Xs (ref `models/vgp.py:284`,
        diagonal=False)."""
        mean, cov = self._joint(self._as_points(Xs))
        Lc = safe_cholesky_rel(cov)
        eps = jax.random.normal(key, (n_samples, cov.shape[0]), cov.dtype)
        P = getattr(self.kernel, "n_outputs", 1)
        return (mean[None] + eps @ Lc.T).reshape(n_samples, -1, P)

    def predict_y(self, Xs, gh_points: int = 20) -> GaussianMoments:
        from ..ops.quadrature import expect_gh

        f = self.predict_f(Xs)
        lik = self.likelihood
        if hasattr(lik, "predict_y_moments"):  # per-output routing
            ey, vy = lik.predict_y_moments(f.mean, f.var, gh_points)
            return GaussianMoments(mean=ey, var=vy)
        if hasattr(lik, "conditional_mean"):
            ey = expect_gh(lik.conditional_mean, f.mean, f.var, gh_points)
            ey2 = expect_gh(
                lambda ff: lik.conditional_variance(ff)
                + lik.conditional_mean(ff) ** 2,
                f.mean, f.var, gh_points,
            )
            return GaussianMoments(mean=ey, var=ey2 - ey**2)
        return f
