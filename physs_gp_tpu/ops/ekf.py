"""Extended Kalman filtering for nonlinear SDE priors + nonlinear observations.

TPU-native counterpart of the reference's EKF dispatch paths:
- nonlinear SDE predict step via `jacfwd` of the Euler-Maruyama mean
  (`computation/filters/kalman_filter.py:245`, `transforms/sdes.py:192`
  EulerMaruyama);
- PDE collocation pseudo-observation updates with the residual Jacobian
  `H_jac` (`kalman_filter.py:341-427`), i.e. observing g(state) = 0;
- extended RTS smoothing with the same linearisation.

The scan body linearises at the running filtered mean (classic EKF), so this
path is sequential (`lax.scan`). Iterated PARALLEL linearisation (linearise
at the previous smoothed trajectory, then run the exact linear parallel
filter — Särkkä-style iterated parallel EKS, PAPERS.md) is available through
`iterated_parallel_ekf_smoother`, which reuses the linear associative-scan
machinery unchanged.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .gaussian import mask_covariance
from .kalman import FilterResult, SmootherResult, masked_update, observation_mask
from .matrix import cholesky_solve, highest_precision, safe_cholesky, symmetrize

__all__ = ["NonlinearSSM", "ekf_filter", "ekf_smoother", "euler_maruyama_sample",
           "iterated_parallel_ekf_smoother"]


class NonlinearSSM(NamedTuple):
    """dx = drift(x) dt + L dW; obs y = obs_fn(x) + noise."""

    drift: Callable  # [d] -> [d]
    L: jnp.ndarray  # [d, w]
    Qc: jnp.ndarray  # [w, w]
    m0: jnp.ndarray  # [d]
    P0: jnp.ndarray  # [d, d]
    obs_fn: Callable  # [d] -> [p]  (nonlinear observation / PDE residual)


def _em_mean_jac(drift, m, dt, n_substeps: int):
    """Euler-Maruyama mean propagation + its Jacobian (EKF A matrix)."""
    h = dt / n_substeps

    def sub(x, _):
        return x + h * drift(x), None

    def prop(x):
        out, _ = jax.lax.scan(sub, x, None, length=n_substeps)
        return out

    A = jax.jacfwd(prop)(m)
    return prop(m), A


def _em_propagate(drift, m, P, LQL, dt, n_substeps: int):
    """Substepped joint (mean, covariance) propagation.

    Substepping the COVARIANCE matters as much as the mean: a single-step
    Q = L Qc L^T dt is only first-order (e.g. OU: 2*lam*dt vs the exact
    1 - e^{-2 lam dt}) and biases the lml noticeably at moderate dt.
    Returns (m_pred, P_pred, A_total) with A_total the composed Jacobian
    (used by the smoother gain).
    """
    h = dt / n_substeps
    d = m.shape[-1]
    eye = jnp.eye(d, dtype=P.dtype)

    def sub(carry, _):
        m, P, A_tot = carry
        J = jax.jacfwd(drift)(m)
        A_s = eye + h * J
        m = m + h * drift(m)
        P = symmetrize(A_s @ P @ A_s.T + LQL * h)
        return (m, P, A_s @ A_tot), None

    (m, P, A_tot), _ = jax.lax.scan(
        sub, (m, P, eye), None, length=n_substeps
    )
    return m, P, A_tot


@highest_precision
def ekf_filter(ssm: NonlinearSSM, t, R, y, mask=None, n_substeps: int = 1
               ) -> FilterResult:
    """Sequential EKF over the nonlinear SSM at time points t [T]."""
    t = jnp.ravel(t)
    T = y.shape[0]
    if mask is None:
        mask = observation_mask(y, ssm.P0.dtype)
    dt = jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.diff(t)])
    LQL = ssm.L @ ssm.Qc @ ssm.L.T

    def step(carry, inp):
        m_prev, P_prev = carry
        dt_k, R_k, y_k, mask_k = inp
        m_pred, P_pred, A = _em_propagate(
            ssm.drift, m_prev, P_prev, LQL, dt_k, n_substeps
        )
        # EKF update: linearise obs_fn at the predicted mean
        h0 = ssm.obs_fn(m_pred)
        Hk = jax.jacfwd(ssm.obs_fn)(m_pred)
        # reuse the masked linear update with the innovation offset:
        # v = y - h(m_pred) = (y - h0 + Hk m_pred) - Hk m_pred
        y_eff = y_k - h0 + Hk @ m_pred
        m, P, lml_k = masked_update(m_pred, P_pred, Hk, R_k, y_eff, mask_k)
        return (m, P), (m, P, lml_k)

    (_, _), (ms, Ps, lmls) = jax.lax.scan(
        step, (ssm.m0, ssm.P0), (dt, R, y, mask)
    )
    return FilterResult(ms=ms, Ps=Ps, lml=jnp.sum(lmls), lmls=lmls)


@highest_precision
def ekf_smoother(ssm: NonlinearSSM, t, filtered: FilterResult,
                 n_substeps: int = 1) -> SmootherResult:
    """Extended RTS smoother (linearised at the filtered means)."""
    t = jnp.ravel(t)
    ms, Ps = filtered.ms, filtered.Ps
    d = ms.shape[-1]
    dt = jnp.diff(t)
    LQL = ssm.L @ ssm.Qc @ ssm.L.T

    def step(carry, inp):
        m_next_s, P_next_s = carry
        m_f, P_f, dt_next = inp
        m_pred, P_pred, A = _em_propagate(
            ssm.drift, m_f, P_f, LQL, dt_next, n_substeps
        )
        Lp = safe_cholesky(P_pred)
        G = cholesky_solve(Lp, A @ P_f).T
        m_s = m_f + G @ (m_next_s - m_pred)
        P_s = symmetrize(P_f + G @ (P_next_s - P_pred) @ G.T)
        return (m_s, P_s), (m_s, P_s, G)

    # flip + forward scan + flip (reverse=True is ~27x slower on TPU)
    flipped = jax.tree_util.tree_map(
        lambda x: x[::-1], (ms[:-1], Ps[:-1], dt)
    )
    (_, _), (ms_s, Ps_s, Gs) = jax.lax.scan(step, (ms[-1], Ps[-1]), flipped)
    ms_s, Ps_s, Gs = jax.tree_util.tree_map(
        lambda x: x[::-1], (ms_s, Ps_s, Gs)
    )
    ms_out = jnp.concatenate([ms_s, ms[-1:]], axis=0)
    Ps_out = jnp.concatenate([Ps_s, Ps[-1:]], axis=0)
    Gs_out = jnp.concatenate([Gs, jnp.zeros((1, d, d), Gs.dtype)], axis=0)
    return SmootherResult(ms=ms_out, Ps=Ps_out, Gs=Gs_out)


def iterated_parallel_ekf_smoother(
    ssm: NonlinearSSM, t, R, y, mask=None, n_iters: int = 5,
    n_substeps: int = 1, chunk_size=None,
):
    """Iterated PARALLEL EKS: linearise the dynamics/observations along a
    reference trajectory, run the exact LINEAR parallel-scan filter/smoother,
    and iterate until the trajectory converges (Särkkä & García-Fernández
    iterated smoothers, PAPERS.md). Gives the log-depth scaling of the
    parallel scan for nonlinear models.
    """
    from .parallel_kalman import parallel_kalman_filter, parallel_rts_smoother

    t = jnp.ravel(t)
    T, d = y.shape[0], ssm.m0.shape[-1]
    if mask is None:
        mask = observation_mask(y, ssm.P0.dtype)
    dt = jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.diff(t)])
    LQL = ssm.L @ ssm.Qc @ ssm.L.T

    def linearise_and_solve(m_ref):
        # dynamics linearised about m_ref[k-1] for each step k
        # roll-not-slice (CLAUDE.md rule 9)
        m_prev_ref = jnp.roll(m_ref, 1, axis=0).at[0].set(ssm.m0)

        def lin_dyn(mp, dtk):
            m_pred, A = _em_mean_jac(ssm.drift, mp, dtk, n_substeps)
            b = m_pred - A @ mp  # affine offset
            return A, b

        A, b = jax.vmap(lin_dyn)(m_prev_ref, dt)
        Q = LQL[None] * dt[:, None, None]
        # observations linearised about m_ref[k]
        h0 = jax.vmap(ssm.obs_fn)(m_ref)
        Hk = jax.vmap(jax.jacfwd(ssm.obs_fn))(m_ref)
        y_eff = y - h0 + jnp.einsum("tpj,tj->tp", Hk, m_ref)
        # fold the affine dynamics offset into the observation by shifting
        # the state: filter the zero-offset system on x' = x - c with
        # c accumulated... simpler: absorb b via an augmented observation —
        # here we instead handle it exactly by shifting y and the prior mean
        # per step using the linear-system identity below.
        return A, b, Q, Hk, y_eff

    # Affine dynamics x_k = A_k x_{k-1} + b_k + q: substitute z_k = x_k - c_k
    # with c_k = A_k c_{k-1} + b_k, c_0 = 0 => z is zero-offset linear; adjust
    # observations y'_k = y_eff_k - H_k c_k and add c back to the means.
    def run_pass(m_ref):
        A, b, Q, Hk, y_eff = linearise_and_solve(m_ref)

        def c_step(c_prev, inp):
            A_k, b_k = inp
            c = A_k @ c_prev + b_k
            return c, c

        _, c = jax.lax.scan(c_step, jnp.zeros((d,), A.dtype), (A, b))
        y_shift = y_eff - jnp.einsum("tpj,tj->tp", Hk, c)
        f = parallel_kalman_filter(
            A, Q, Hk, R, y_shift, ssm.m0, ssm.P0, mask=mask,
            chunk_size=chunk_size,
        )
        s = parallel_rts_smoother(A, Q, f, chunk_size=chunk_size)
        return (
            f._replace(ms=f.ms + c),
            s._replace(ms=s.ms + c),
        )

    # initial reference: propagate the prior mean forward (noise-free)
    def prop_step(m, dtk):
        m2, _ = _em_mean_jac(ssm.drift, m, dtk, n_substeps)
        return m2, m2

    _, m_ref = jax.lax.scan(prop_step, ssm.m0, dt)
    f = s = None
    for _ in range(n_iters):
        f, s = run_pass(m_ref)
        m_ref = s.ms
    return f, s


def euler_maruyama_sample(drift, L, Qc, x0, t, key, n_substeps: int = 1):
    """Forward-simulate the SDE (data generation; ref
    `computation/solvers/euler.py`, `transforms/sdes.py:192`)."""
    t = jnp.ravel(t)
    dt = jnp.diff(t)
    d = x0.shape[-1]
    Ls = jnp.linalg.cholesky(Qc + 1e-12 * jnp.eye(Qc.shape[-1], dtype=Qc.dtype))

    def step(carry, inp):
        x, key = carry
        dtk = inp
        h = dtk / n_substeps

        def sub(c, _):
            xx, kk = c
            kk, sub_k = jax.random.split(kk)
            eps = jax.random.normal(sub_k, (Qc.shape[-1],), x0.dtype)
            xx = xx + h * drift(xx) + L @ (Ls @ eps) * jnp.sqrt(h)
            return (xx, kk), None

        (x, key), _ = jax.lax.scan(sub, (x, key), None, length=n_substeps)
        return (x, key), x

    (_, _), xs = jax.lax.scan(step, (x0, key), dt)
    return jnp.concatenate([x0[None], xs], axis=0)
