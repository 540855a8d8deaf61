"""Gaussian density algebra with missing-data masking.

TPU-native counterpart of `stgp/computation/gaussian.py:15-246` and
`computation/elbos/kullback_leiblers.py`. Missing observations are handled by
*masking inside fixed-shape algebra* (zero the masked rows/cols and put 1 on
the masked diagonal), which keeps every step of `lax.scan`/`associative_scan`
a static-shape batched matmul — no gather/scatter, no dynamic shapes.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from .matrix import (
    log_det_from_chol,
    psd_solve_logdet,
    safe_cholesky,
    solve_lower,
    symmetrize,
)

__all__ = [
    "mvn_logpdf",
    "masked_mvn_logpdf",
    "mask_covariance",
    "gaussian_kl",
    "gaussian_expected_logpdf_diag",
]

_LOG2PI = math.log(2.0 * math.pi)


def mvn_logpdf(y: jnp.ndarray, mean: jnp.ndarray, cov: jnp.ndarray) -> jnp.ndarray:
    """log N(y | mean, cov); y, mean: [..., n], cov: [..., n, n]."""
    n = y.shape[-1]
    L = safe_cholesky(cov)
    diff = (y - mean)[..., None]
    alpha = solve_lower(L, diff)[..., 0]
    maha = jnp.sum(alpha * alpha, -1)
    return -0.5 * (maha + log_det_from_chol(L) + n * _LOG2PI)


def mask_covariance(cov: jnp.ndarray, obs_mask: jnp.ndarray) -> jnp.ndarray:
    """Zero masked rows/cols of cov, put 1.0 on the masked diagonal.

    obs_mask: [..., n] with 1.0 = observed, 0.0 = missing. The resulting
    matrix has the same Cholesky/logdet/solve structure as the submatrix of
    observed entries, with missing dims contributing exactly 0 to logdet and
    Mahalanobis terms (given masked residuals).
    """
    m = obs_mask[..., :, None] * obs_mask[..., None, :]
    eye = jnp.eye(cov.shape[-1], dtype=cov.dtype)
    diag_fix = (1.0 - obs_mask)[..., :, None] * eye
    return cov * m + diag_fix


def masked_mvn_logpdf(
    y: jnp.ndarray, mean: jnp.ndarray, cov: jnp.ndarray, obs_mask: jnp.ndarray
) -> jnp.ndarray:
    """log N(y_obs | mean_obs, cov_obs) over the observed subset only.

    Equivalent to slicing out observed dims, but fixed-shape (scan-friendly).
    Missing y entries may be NaN; they are zeroed before use.
    """
    obs_mask = obs_mask.astype(cov.dtype)
    y = jnp.where(obs_mask > 0, jnp.nan_to_num(y), 0.0)
    mean = mean * obs_mask
    cov_m = mask_covariance(cov, obs_mask)
    diff = y - mean
    # fused solve+logdet (Pallas lane-batched on TPU for [T, d<=40, d])
    alpha, logdet = psd_solve_logdet(cov_m, diff[..., None])
    maha = jnp.sum(diff * alpha[..., 0], -1)
    n_obs = jnp.sum(obs_mask, -1)
    return -0.5 * (maha + logdet + n_obs * _LOG2PI)


def gaussian_kl(
    m_q: jnp.ndarray, L_q: jnp.ndarray, m_p: jnp.ndarray, L_p: jnp.ndarray
) -> jnp.ndarray:
    """KL(N(m_q, L_q L_q^T) || N(m_p, L_p L_p^T)) from Cholesky factors.

    (ref: `kullback_leiblers.py:20`)
    """
    n = m_q.shape[-1]
    M = solve_lower(L_p, L_q)
    trace = jnp.sum(M * M, (-1, -2))
    diff = solve_lower(L_p, (m_p - m_q)[..., None])[..., 0]
    maha = jnp.sum(diff * diff, -1)
    logdet = log_det_from_chol(L_p) - log_det_from_chol(L_q)
    return 0.5 * (trace + maha - n + logdet)


def gaussian_expected_logpdf_diag(
    y: jnp.ndarray, m: jnp.ndarray, v: jnp.ndarray, noise_var: jnp.ndarray
) -> jnp.ndarray:
    """E_{f~N(m,v)}[ log N(y | f, noise_var) ] elementwise (closed form)."""
    return -0.5 * (
        _LOG2PI + jnp.log(noise_var) + ((y - m) ** 2 + v) / noise_var
    )


def symmetrize_cov(P: jnp.ndarray) -> jnp.ndarray:
    return symmetrize(P)
