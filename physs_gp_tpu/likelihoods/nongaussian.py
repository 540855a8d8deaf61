"""Non-Gaussian likelihoods with variational-expectation interfaces.

Counterpart of `stgp/likelihood/{poisson,bernoulli,probit,power,loss}.py`.
Every likelihood exposes:

- `log_prob(y, f)`   elementwise log p(y | f)
- `expected_log_lik(y, m, v)` elementwise E_{f~N(m,v)}[log p(y|f)] — closed
  form where one exists (Gaussian, Poisson-log-link), Gauss-Hermite otherwise
  (ref: `computation/integrals/approximators.py`, `dispatched_ell.py:255`).
- `conditional_mean(f)` / `conditional_variance(f)` for predict_y moment
  matching (ref: `computation/predictors/y_predictors.py`).

NaN observations contribute exactly 0 (missing-data convention shared with
the filters).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.quadrature import expect_gh
from ..utils.params import Param, positive_param
from ..utils.struct import field, module, static
from .gaussian import Gaussian, Likelihood

__all__ = ["Poisson", "Bernoulli", "Probit", "PerOutputLikelihood", "expected_log_lik"]

_LOG2PI = math.log(2.0 * math.pi)


def _mask_nan(y, val):
    """Zero the contribution of missing (NaN) observations."""
    ok = jnp.isfinite(y)
    return jnp.where(ok, jnp.nan_to_num(val), 0.0)


@module
class Poisson(Likelihood):
    """y ~ Poisson(g(f)); default log link g = exp (ref: `likelihood/poisson.py:9`).

    With the log link the variational expectation is closed-form:
        E[log p] = y m - exp(m + v/2) - lgamma(y + 1).
    """

    binsize: float = static(default=1.0)

    def log_prob(self, y, f):
        rate = jnp.exp(f) * self.binsize
        return y * jnp.log(rate) - rate - jax.lax.lgamma(y + 1.0)

    def expected_log_lik(self, y, m, v):
        y0 = jnp.nan_to_num(y)
        val = (
            y0 * (m + jnp.log(self.binsize))
            - jnp.exp(m + 0.5 * v) * self.binsize
            - jax.lax.lgamma(y0 + 1.0)
        )
        return _mask_nan(y, val)

    def conditional_mean(self, f):
        return jnp.exp(f) * self.binsize

    def conditional_variance(self, f):
        return jnp.exp(f) * self.binsize


def _log_ndtr(z):
    return jax.scipy.special.log_ndtr(z)


@module
class Bernoulli(Likelihood):
    """y in {0,1}, probit link P(y=1|f) = Phi(f) (ref: `likelihood/bernoulli.py:11`)."""

    gh_points: int = static(default=20)

    def log_prob(self, y, f):
        z = jnp.where(y > 0.5, f, -f)
        return _log_ndtr(z)

    def expected_log_lik(self, y, m, v):
        y0 = jnp.nan_to_num(y)
        val = expect_gh(
            lambda ff: _log_ndtr(jnp.where(y0[..., None] > 0.5, ff, -ff)),
            m,
            v,
            self.gh_points,
        )
        return _mask_nan(y, val)

    def conditional_mean(self, f):
        return jax.scipy.stats.norm.cdf(f)

    def conditional_variance(self, f):
        p = jax.scipy.stats.norm.cdf(f)
        return p * (1 - p)


@module
class Probit(Likelihood):
    """nu-scaled probit on pseudo-observations: p(y=1|f) = Phi(f / nu).

    Used for inequality/monotonicity constraints (ref: `likelihood/probit.py:9`,
    monotonic_timeseries experiment `models/m_stgp.py:122-160`).
    """

    nu: float = static(default=1e-2)
    gh_points: int = static(default=20)

    def log_prob(self, y, f):
        z = jnp.where(y > 0.5, f, -f) / self.nu
        return _log_ndtr(z)

    def expected_log_lik(self, y, m, v):
        y0 = jnp.nan_to_num(y)
        val = expect_gh(
            lambda ff: _log_ndtr(
                jnp.where(y0[..., None] > 0.5, ff, -ff) / self.nu
            ),
            m,
            v,
            self.gh_points,
        )
        return _mask_nan(y, val)

    def conditional_mean(self, f):
        return jax.scipy.stats.norm.cdf(f / self.nu)

    def conditional_variance(self, f):
        p = jax.scipy.stats.norm.cdf(f / self.nu)
        return p * (1 - p)


def expected_log_lik(lik, y, m, v):
    """Dispatch E_{N(m,v)}[log p(y|f)] elementwise; Gaussian closed form here
    to keep the Gaussian likelihood module dependency-light."""
    if isinstance(lik, Gaussian):
        nv = lik.variance.value
        y0 = jnp.nan_to_num(y)
        val = -0.5 * (_LOG2PI + jnp.log(nv) + ((y0 - m) ** 2 + v) / nv)
        return _mask_nan(y, val)
    return lik.expected_log_lik(y, m, v)


@module
class Power(Likelihood):
    """Power/Tweedie-style likelihood: y = f^power + Gaussian noise on the
    transformed scale (ref `likelihood/power.py:7`)."""

    power: float = static(default=2.0)
    gh_points: int = static(default=20)

    def log_prob(self, y, f):
        mu = jnp.sign(f) * jnp.abs(f) ** self.power
        return -0.5 * (_LOG2PI + (y - mu) ** 2)

    def expected_log_lik(self, y, m, v):
        y0 = jnp.nan_to_num(y)
        val = expect_gh(
            lambda ff: self.log_prob(y0[..., None], ff), m, v, self.gh_points
        )
        return _mask_nan(y, val)

    def conditional_mean(self, f):
        return jnp.sign(f) * jnp.abs(f) ** self.power

    def conditional_variance(self, f):
        return jnp.ones_like(f)


@module
class LossLikelihood(Likelihood):
    """Arbitrary loss as a pseudo-likelihood: log p(y|f) = -loss(y, f)
    (ref `likelihood/loss.py:5`); expectations by Gauss-Hermite."""

    loss: object = static(default=None)  # (y, f) -> elementwise loss
    gh_points: int = static(default=20)

    def log_prob(self, y, f):
        return -self.loss(y, f)

    def expected_log_lik(self, y, m, v):
        y0 = jnp.nan_to_num(y)
        val = expect_gh(
            lambda ff: -self.loss(y0[..., None], ff), m, v, self.gh_points
        )
        return _mask_nan(y, val)

    def conditional_mean(self, f):
        return f

    def conditional_variance(self, f):
        return jnp.ones_like(f)


@module
class PerOutputLikelihood(Likelihood):
    """Route column p of data-major multi-output arrays to `liks[p]` — the
    reference's `lik_arr` per-output likelihood lists (`zoo/diff.py:93`
    diff_vgp: Gaussian data head + fixed-variance/Probit constraint heads).

    All arrays are DATA-MAJOR flat [N*P] (SVGP's layout); entries reshape
    to [N, P] and dispatch per column."""

    liks: list

    def _cols(self, *arrs):
        P = len(self.liks)
        return [a.reshape(-1, P) for a in arrs]

    def log_prob(self, y, f):
        y2, f2 = self._cols(y, f)
        out = jnp.stack(
            [lik.log_prob(y2[:, p], f2[:, p]) for p, lik in enumerate(self.liks)],
            axis=-1,
        )
        return out.reshape(y.shape)

    def expected_log_lik(self, y, m, v):
        y2, m2, v2 = self._cols(y, m, v)
        out = jnp.stack(
            [
                expected_log_lik(lik, y2[:, p], m2[:, p], v2[:, p])
                for p, lik in enumerate(self.liks)
            ],
            axis=-1,
        )
        return out.reshape(y.shape)

    # same per-head predictive contract as CompositeLikelihood — models
    # route predict_y / nlpd through these (f_mean/f_var [N, P])
    def predict_y_moments(self, f_mean, f_var, gh_points: int = 20):
        means, vrs = [], []
        for p, lik in enumerate(self.liks):
            m, v = f_mean[..., p], f_var[..., p]
            ey = expect_gh(lik.conditional_mean, m, v, gh_points)
            ey2 = expect_gh(
                lambda ff, lik=lik: lik.conditional_variance(ff)
                + lik.conditional_mean(ff) ** 2,
                m, v, gh_points,
            )
            means.append(ey)
            vrs.append(ey2 - ey * ey)
        return jnp.stack(means, -1), jnp.stack(vrs, -1)

    def predictive_log_density(self, y, f_mean, f_var, gh_points: int = 20):
        from ..ops.quadrature import expect_gh_log

        cols = []
        for p, lik in enumerate(self.liks):
            y0 = jnp.nan_to_num(y[..., p])
            cols.append(
                expect_gh_log(
                    lambda ff, lik=lik, y0=y0: lik.log_prob(y0[..., None], ff),
                    f_mean[..., p], f_var[..., p], gh_points,
                )
            )
        return jnp.stack(cols, -1)
