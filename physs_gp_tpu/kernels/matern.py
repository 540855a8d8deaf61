"""Matérn half-integer family with exact closed-form state space.

TPU-native counterpart of `stgp/kernels/matern.py` (Matern12/32/52/72,
ref lines 13-395) and `kernels/ss_utils.py:7-42`. The reference hand-codes
per-order `to_ss`/`expm`; here ONE implementation covers every half-integer
order p (nu = p + 1/2):

- F is the companion matrix of (s + lam)^d with d = p+1, lam = sqrt(2 nu)/ls.
- N = F + lam*I is nilpotent (N^d = 0) because F is non-derogatory with the
  single eigenvalue -lam, so the matrix exponential terminates exactly:
      A(dt) = expm(F dt) = exp(-lam dt) * sum_{k<d} N^k dt^k / k!
  This evaluates as one einsum over precomputed nilpotent powers — batched
  over all T timesteps at once, ideal for the MXU (vs. a vmapped Pade expm).
- Qc = sigma^2 * 2*sqrt(pi) * Gamma(d) / Gamma(d - 1/2) * lam^(2d-1)
  (spectral-density matching), and P_inf solves the d x d Lyapunov equation.

**Balanced state (fp32-critical TPU design choice).** The canonical state
(f, f', ..., f^(p)) spans scales 1 : lam : ... : lam^p, so P_inf's condition
number is lam^(2p) — at short lengthscales fp32 Cholesky of filter
covariances fails (observed: NaN smoothers under tight collocation noise).
We therefore use the similarity-transformed state x̃_k = f^(k) / lam^k:
    F̃ = lam * (unit superdiagonal - binomial last row),   H = e_0,
    P̃inf = D⁻¹ P_inf D⁻¹ = O(sigma²) in every entry,     Q̃c = Qc / lam^(2p),
which keeps every filter matrix O(1)-conditioned for ALL lengthscales. The
k-th derivative is recovered as f^(k) = lam^k x̃_k (`transforms.operators.
derivative_row` applies the scale). The reference uses the raw basis and
needs fp64 + forced solves instead (`settings.py:41-49`).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..utils.params import Param, positive_param
from ..utils.struct import field, module, static
from .base import StationaryKernel
from .markov import MarkovKernel, StateSpace, solve_pinf

__all__ = ["Matern", "Matern12", "Matern32", "Matern52", "Matern72"]


def _matern_corr(p: int, r: jnp.ndarray) -> jnp.ndarray:
    """Unit-variance Matérn correlation, r = |x1-x2|/ls, nu = p + 1/2."""
    s = math.sqrt(2 * p + 1)  # sqrt(2 nu)
    sr = s * r
    if p == 0:
        poly = 1.0
    elif p == 1:
        poly = 1.0 + sr
    elif p == 2:
        poly = 1.0 + sr + sr**2 / 3.0
    elif p == 3:
        poly = 1.0 + sr + 2.0 * sr**2 / 5.0 + sr**3 / 15.0
    else:
        # general: k = exp(-sr) * p!/(2p)! * sum_{i<=p} (p+i)!/(i!(p-i)!) (2 sr)^(p-i)
        poly = sum(
            (math.factorial(p) / math.factorial(2 * p))
            * (math.factorial(p + i) / (math.factorial(i) * math.factorial(p - i)))
            * (2.0 * sr) ** (p - i)
            for i in range(p + 1)
        )
    return poly * jnp.exp(-sr)


@module
class Matern(StationaryKernel, MarkovKernel):
    """Matérn kernel of half-integer order nu = p + 1/2 (state dim d = p+1)."""

    lengthscales: Param = field(default_factory=lambda: positive_param(1.0))
    variance: Param = field(default_factory=lambda: positive_param(1.0))
    p: int = static(default=1)

    # ---- batch (Gram) interface ----
    def k_from_sqdist(self, d2):
        r = jnp.sqrt(jnp.maximum(d2, 1e-36))
        return _matern_corr(self.p, r)

    # ---- Markov interface ----
    @property
    def _lam(self):
        # temporal kernels are 1-D: use the first (only) lengthscale
        ls = jnp.ravel(jnp.atleast_1d(self.lengthscales.value))[0]
        return math.sqrt(2 * self.p + 1) / ls

    def to_ss(self) -> StateSpace:
        """State space in the BALANCED basis x̃_k = f^(k)/lam^k (see module
        docstring): F̃ = lam (S - B), every matrix O(1)-conditioned."""
        d = self.p + 1
        lam = self._lam
        var = self.variance.value
        dtype = jnp.result_type(lam, var)
        S = jnp.diag(jnp.ones(d - 1, dtype), 1) if d > 1 else jnp.zeros((1, 1), dtype)
        coeffs = jnp.array([math.comb(d, k) for k in range(d)], dtype)
        F = lam * S.at[-1, :].set(-coeffs)
        L = jnp.zeros((d, 1), dtype).at[-1, 0].set(1.0)
        # Qc in the balanced basis: Qc_raw / lam^(2(d-1))
        qc = (
            var
            * 2.0
            * math.sqrt(math.pi)
            * (math.gamma(d) / math.gamma(d - 0.5))
            * lam
        )
        Qc = jnp.asarray(qc, dtype).reshape(1, 1)
        H = jnp.zeros((1, d), dtype).at[0, 0].set(1.0)
        Pinf = solve_pinf(F, L, Qc)
        return StateSpace(F=F, L=L, Qc=Qc, H=H, Pinf=Pinf, minf=jnp.zeros(d, dtype))

    def k_deriv_fn(self, a: tuple, b: tuple):
        """Exact derivative cross-covariance ∂^a_{x1} ∂^b_{x2} k — closed
        form, NOT autodiff (the |τ| chain zeroes/NaNs autodiff on the
        diagonal). For τ > 0 write k(τ) = σ² e^{-λτ} Q₀(λτ); then
            k⁽ʲ⁾(τ) = σ² λʲ e^{-λτ} Q_j(λτ),   Q_{j+1} = Q_j′ − Q_j,
        extended to τ ≤ 0 by evenness (odd j picks up sign(τ), which is 0
        at τ = 0 exactly where odd derivatives of an even function vanish),
        and ∂^m_{x1}∂^n_{x2} k(x1−x2) = (−1)ⁿ k⁽ᵐ⁺ⁿ⁾(τ). Valid for
        m, n ≤ p (the orders the Markov state carries); cross-gated against
        the state-space filter in tests/test_deriv_zoo.py."""
        if not (a or b):
            return None  # value block: k_scalar is exact for any input dim
        if any(i != 0 for i in (*a, *b)):
            raise ValueError("Matern is 1-D (temporal); derivative dims must be 0")
        m, n = len(a), len(b)
        if max(m, n) > self.p:
            raise ValueError(
                f"Matern nu={self.p}+1/2 supports derivative orders <= {self.p}; "
                f"got orders ({m}, {n})"
            )
        p, j = self.p, m + n
        # Q_0 coefficients, ascending powers of u = lam*|tau| (unit variance;
        # same polynomial as _matern_corr)
        c = [0.0] * (p + 1)
        for i in range(p + 1):
            c[p - i] = (
                (math.factorial(p) / math.factorial(2 * p))
                * (math.factorial(p + i) / (math.factorial(i) * math.factorial(p - i)))
                * 2.0 ** (p - i)
            )
        for _ in range(j):  # Q <- Q' - Q (degree stays <= p)
            c = [
                ((k + 1) * c[k + 1] if k < p else 0.0) - c[k]
                for k in range(p + 1)
            ]
        sgn = (-1.0) ** n
        odd = j % 2 == 1

        def fn(x1, x2):
            lam = self._lam
            x1 = jnp.ravel(jnp.atleast_1d(x1))
            x2 = jnp.ravel(jnp.atleast_1d(x2))
            if x1.shape[0] != 1 or x2.shape[0] != 1:
                raise ValueError(
                    f"Matern.k_deriv_fn is 1-D (temporal) but got inputs of "
                    f"dim {x1.shape[0]}; route the Matern factor through "
                    f"OnDims(matern, (t_dim,)) inside a ProductKernel"
                )
            tau = x1[0] - x2[0]
            u = lam * jnp.abs(tau)
            poly = c[p]
            for k in range(p - 1, -1, -1):  # Horner
                poly = poly * u + c[k]
            val = sgn * self.variance.value * lam**j * jnp.exp(-u) * poly
            return val * jnp.sign(tau) if odd else val

        return fn

    def transition(self, dt: jnp.ndarray) -> jnp.ndarray:
        """Exact A(dt) by the terminating nilpotent expansion; batched over dt."""
        d = self.p + 1
        lam = self._lam
        dt = jnp.asarray(dt)
        dtype = jnp.result_type(dt, lam)
        ss = self.to_ss()
        N = ss.F.astype(dtype) + lam * jnp.eye(d, dtype=dtype)
        powers = [jnp.eye(d, dtype=dtype)]
        for _ in range(d - 1):
            powers.append(powers[-1] @ N)
        powers = jnp.stack(
            [powers[k] / math.factorial(k) for k in range(d)]
        )  # [d, d, d]
        dtk = dt[..., None] ** jnp.arange(d, dtype=dtype)  # [..., d]
        poly = jnp.einsum("...k,kij->...ij", dtk, powers)
        return jnp.exp(-lam * dt)[..., None, None] * poly

    def noise_cov(self, dt: jnp.ndarray) -> jnp.ndarray:
        """Cancellation-free discretised process noise Q(dt), batched over dt.

        The naive stationary identity Q = Pinf - A Pinf A^T is catastrophic in
        fp32 for small dt (true Q entries are O((lam*dt)^k) while the
        subtraction carries O(eps * Pinf) absolute error — on TPU this drives
        filtered covariances negative). Instead evaluate the exact integral
            Q(dt) = integral_0^dt e^{F s} L Qc L^T e^{F^T s} ds
        termwise with the nilpotent expansion e^{F s} L =
        e^{-lam s} sum_k v_k s^k / k!  (v_k = N^k L):
            Q = Qc * sum_{k,l} v_k v_l^T / (k! l!) * I_{k+l}(dt),
            I_m(dt) = m! / (2 lam)^{m+1} * gammainc(m+1, 2 lam dt),
        which is positive by construction and accurate for all dt.
        """
        d = self.p + 1
        lam = self._lam
        dt = jnp.asarray(dt)
        dtype = jnp.result_type(dt, lam)
        ss = self.to_ss()
        N = ss.F.astype(dtype) + lam * jnp.eye(d, dtype=dtype)
        v = [ss.L[:, 0].astype(dtype)]
        for _ in range(d - 1):
            v.append(N @ v[-1])
        # C_m = sum_{k+l=m} v_k v_l^T / (k! l!)   for m = 0 .. 2d-2
        C = jnp.stack(
            [
                sum(
                    jnp.outer(v[k], v[m - k])
                    / (math.factorial(k) * math.factorial(m - k))
                    for k in range(max(0, m - d + 1), min(m, d - 1) + 1)
                )
                for m in range(2 * d - 1)
            ]
        )  # [2d-1, d, d]
        m_arr = jnp.arange(2 * d - 1, dtype=dtype)
        fact = jnp.array([math.factorial(m) for m in range(2 * d - 1)], dtype)
        x = 2.0 * lam * dt[..., None]  # [..., 2d-1] broadcast over m
        # double-where: gammainc's x-gradient is NaN at x == 0 (0 * log 0),
        # and dt == 0 occurs by convention at the first step of every grid.
        x_is0 = x <= 0.0
        x_safe = jnp.where(x_is0, 1.0, x)
        Im = fact * (2.0 * lam) ** -(m_arr + 1.0) * jax.scipy.special.gammainc(
            m_arr + 1.0, x_safe
        )
        Im = jnp.where(x_is0, 0.0, Im)
        qc = ss.Qc[0, 0].astype(dtype)
        return qc * jnp.einsum("...m,mij->...ij", Im, C)


def Matern12(**kw) -> Matern:
    return Matern(p=0, **_defaults(kw))


def Matern32(**kw) -> Matern:
    return Matern(p=1, **_defaults(kw))


def Matern52(**kw) -> Matern:
    return Matern(p=2, **_defaults(kw))


def Matern72(**kw) -> Matern:
    return Matern(p=3, **_defaults(kw))


def _defaults(kw):
    out = {}
    ls = kw.pop("lengthscales", kw.pop("lengthscale", 1.0))
    var = kw.pop("variance", 1.0)
    out["lengthscales"] = ls if isinstance(ls, Param) else positive_param(ls)
    out["variance"] = var if isinstance(var, Param) else positive_param(var)
    out.update(kw)
    return out
