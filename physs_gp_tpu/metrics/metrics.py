"""Evaluation metrics: RMSE, NLPD, confidence intervals.

Counterpart of `stgp/metrics/nlpd.py:44+` (dispatched exact/quadrature/MC
NLPD) and `computation/predictors/confidence_intervals.py`. All NaN-aware
(missing targets contribute nothing).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


__all__ = ["rmse", "gaussian_nlpd", "nlpd_quadrature", "confidence_interval"]

_LOG2PI = math.log(2.0 * math.pi)


def rmse(y_true, y_pred) -> jnp.ndarray:
    y_true = jnp.asarray(y_true)
    ok = jnp.isfinite(y_true)
    se = jnp.where(ok, jnp.nan_to_num(y_true - y_pred) ** 2, 0.0)
    return jnp.sqrt(jnp.sum(se) / jnp.sum(ok))


def gaussian_nlpd(y, mean, var) -> jnp.ndarray:
    """Mean NLPD under Gaussian predictive moments (exact closed form)."""
    y = jnp.asarray(y)
    ok = jnp.isfinite(y)
    val = 0.5 * (_LOG2PI + jnp.log(var) + jnp.nan_to_num(y - mean) ** 2 / var)
    return jnp.sum(jnp.where(ok, val, 0.0)) / jnp.sum(ok)


def nlpd_quadrature(likelihood, y, f_mean, f_var, gh_points: int = 20):
    """Mean NLPD marginalising the latent with Gauss-Hermite quadrature
    (ref `metrics/nlpd.py:44` quadrature branch)."""
    from ..ops.quadrature import expect_gh_log

    y = jnp.asarray(y)
    # log-domain quadrature: exp(log_prob) underflows fp32 at logpdf < -88
    val = -expect_gh_log(
        lambda ff: likelihood.log_prob(jnp.nan_to_num(y)[..., None], ff),
        f_mean,
        f_var,
        gh_points,
    )
    ok = jnp.isfinite(y)
    return jnp.sum(jnp.where(ok, val, 0.0)) / jnp.sum(ok)


def confidence_interval(mean, var, level: float = 0.95):
    """Central Gaussian credible interval (ref confidence_intervals.py)."""
    from jax.scipy.stats import norm

    z = jax.scipy.special.ndtri(0.5 + level / 2.0)
    sd = jnp.sqrt(var)
    return mean - z * sd, mean + z * sd


def response_curve(model, X_grid, feature: int = 0, X_ref=None, gh_points: int = 20):
    """1-D response curve: predictive mean/CI sweeping one input feature with
    the others held at reference values (ref `metrics/response_curves.py`)."""
    import numpy as np

    X_grid = jnp.ravel(jnp.asarray(X_grid))
    if X_ref is None:
        Xs = X_grid[:, None]
    else:
        X_ref = jnp.ravel(jnp.asarray(X_ref))
        Xs = jnp.tile(X_ref[None, :], (X_grid.shape[0], 1))
        Xs = Xs.at[:, feature].set(X_grid)
    pred = model.predict_f(Xs)
    lo, hi = confidence_interval(pred.mean, pred.var)
    return pred.mean, lo, hi


def sample_confidence_intervals(model, key, n_samples: int = 256,
                                t_new=None, Xs=None, level: float = 0.95,
                                link=None):
    """Median + central credible interval from JOINT posterior samples —
    the reference's `VGP.confidence_intervals(XS, num_samples)` surface
    (`models/vgp.py:306`): exact for non-Gaussian links/functionals where
    the moment-based `confidence_interval` is only an approximation.

    `model` needs `sample_f` (state-space models take `t_new=`, batch
    models take `Xs=`); `link` optionally maps sampled f through the
    likelihood's conditional mean (e.g. `lik.conditional_mean`). Returns
    (median, lo, hi), each shaped like one sample's trailing dims.
    """
    if Xs is not None:
        fs = model.sample_f(key, Xs, n_samples)
    elif t_new is not None:
        fs = model.sample_f(key, n_samples, t_new=t_new)
    else:
        fs = model.sample_f(key, n_samples)
    if link is not None:
        fs = link(fs)
    a = (1.0 - level) / 2.0
    qs = jnp.quantile(fs, jnp.asarray([a, 0.5, 1.0 - a]), axis=0)
    return qs[1], qs[0], qs[2]
