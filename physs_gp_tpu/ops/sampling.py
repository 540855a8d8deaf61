"""Trajectory sampling for linear-Gaussian SSMs — prior scans + Matheron
posterior samples.

TPU-native counterpart of the reference's `VGP.samples` surface
(`models/vgp.py:284`, `computation/integrals/samples.py`): the reference
draws from dense marginals; here joint POSTERIOR trajectories come from
Matheron's rule (pathwise conditioning),

    x_post = x~ + E[x | Y] − E[x | Y~],      (x~, Y~) ~ prior model,

so a sample costs one prior trajectory + one smoother pass — O(T) work,
O(log T) depth, and every operation is machinery the filters already have.
The prior trajectory itself is the first-order affine recurrence
x_k = A_k x_{k−1} + c_k, which is associative in (A, c):

    (A₂, c₂) ∘ (A₁, c₁) = (A₂A₁, A₂c₁ + c₂),

one more `associative_scan` of batched d×d matmuls (MXU-shaped), NOT a
sequential loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .matrix import highest_precision, safe_cholesky_rel

__all__ = ["sample_lgssm_states", "matheron_state_samples"]


def _affine_combine(e1, e2):
    """(A, c) composition; c carries a leading sample axis after the scan
    axis: A [L, d, d], c [L, S, d]."""
    A1, c1 = e1
    A2, c2 = e2
    return A2 @ A1, jnp.einsum("lij,lsj->lsi", A2, c1) + c2


@highest_precision
def sample_lgssm_states(key, ssm, n_samples: int, parallel: bool = True,
                        chunk_size=None):
    """n prior state trajectories [S, T, d] of the LGSSM.

    Convention (ops/lgssm.py): A[0] = I, Q[0] = 0 and the step-1 prior is
    N(m0, P0); the scan element at t = 0 is therefore (0, m0 + L₀ε₀) — it
    ignores the carry — and element t ≥ 1 is (A_t, L_{Q_t} ε_t).
    Noise factors use RELATIVE-jitter Choleskys: an absolute floor would
    inject a random walk that ACCUMULATES over exactly-zero-Q steps
    (periodic rotation kernels have Q = 0 at every step and orthogonal A,
    so per-step jitter never decays — ~T·jitter spurious variance by the
    end of the series).

    `chunk_size` bounds the traced associative-scan length (CLAUDE.md
    rule 5): an outer `lax.scan` over chunks carries the last state, and
    each chunk's inclusive (A, c) prefixes replay it exactly.
    """
    T, d = ssm.A.shape[0], ssm.A.shape[-1]
    dtype = ssm.A.dtype
    eps = jax.random.normal(key, (T, n_samples, d), dtype)
    LQ = safe_cholesky_rel(ssm.Q)  # [T, d, d]
    L0 = safe_cholesky_rel(ssm.P0)
    c = jnp.einsum("tij,tsj->tsi", LQ.at[0].set(L0), eps)
    c = c.at[0].add(ssm.m0)
    A = ssm.A.at[0].set(jnp.zeros((d, d), dtype))
    if not parallel:
        def step(x, e):
            A_t, c_t = e
            x = x @ A_t.T + c_t  # [S, d]
            return x, x

        _, xs = jax.lax.scan(step, jnp.zeros((n_samples, d), dtype), (A, c))
    elif chunk_size is not None and T > chunk_size:
        pad = (-T) % chunk_size
        if pad:
            A = jnp.concatenate(
                [A, jnp.broadcast_to(jnp.eye(d, dtype=dtype), (pad, d, d))]
            )
            c = jnp.concatenate([c, jnp.zeros((pad,) + c.shape[1:], dtype)])
        nc = A.shape[0] // chunk_size
        Ar = A.reshape(nc, chunk_size, d, d)
        cr = c.reshape(nc, chunk_size, n_samples, d)

        def chunk_step(x_in, elems):
            Aps, cps = jax.lax.associative_scan(_affine_combine, elems)
            xs = jnp.einsum("kij,sj->ksi", Aps, x_in) + cps
            return xs[-1], xs

        _, xs = jax.lax.scan(
            chunk_step, jnp.zeros((n_samples, d), dtype), (Ar, cr)
        )
        xs = xs.reshape(-1, n_samples, d)[:T]
    else:
        _, xs = jax.lax.associative_scan(_affine_combine, (A, c))
    return jnp.swapaxes(xs, 0, 1)  # [S, T, d]


@highest_precision
def matheron_state_samples(key, ssm, R, Y, n_samples: int,
                           parallel: bool = True, sqrt: bool = False,
                           chunk_size=None, mesh=None, mesh_axis: str = "t"):
    """Joint posterior STATE samples [S, T, d] given observations Y [T, p]
    (NaN = missing) by pathwise conditioning.

    Draw (x~, Y~) from the prior model (Y~ keeps Y's NaN pattern — the
    conditioning set must match), smooth the data and every pseudo-dataset
    in ONE vmapped pass, and shift:  x_s = x~_s + ms(Y) − ms(Y~_s).
    Exact for any prior mean m0 (the affine smoother offset cancels).

    Known cost: the vmapped pass recomputes the data-INDEPENDENT
    covariance/gain recursion per pseudo-dataset (S+1×). A shared-gain
    multi-RHS mean recursion would cut the O(T d³) side to one pass — worth
    it if sampling at S ≫ 64 becomes a hot path; today's uses (credible
    bands at S ≤ a few hundred, tiny d) don't justify forking the four
    filter cores.
    """
    from .runner import run_filter_smoother

    k_x, k_y = jax.random.split(key)
    T, p = Y.shape
    xprior = sample_lgssm_states(
        k_x, ssm, n_samples, parallel=parallel, chunk_size=chunk_size
    )
    # pseudo-observations: marginalising a joint chol(R) draw onto the
    # observed entries IS the observed-block noise marginal, so no masking
    # is needed here (the smoother masks)
    LR = safe_cholesky_rel(R)  # [T, p, p]
    eps_y = jax.random.normal(k_y, (n_samples, T, p), Y.dtype)
    from .lgssm import project_mean

    y_noise = jnp.einsum("tij,stj->sti", LR, eps_y)
    Yt = jax.vmap(lambda x: project_mean(ssm.H, x))(xprior) + y_noise
    Yt = jnp.where(jnp.isnan(Y)[None], jnp.nan, Yt)  # copy the pattern
    Y_all = jnp.concatenate([Y[None], Yt])  # [S+1, T, p]

    def smooth_one(Yb):
        _, s = run_filter_smoother(
            ssm, R, Yb, parallel=parallel, sqrt=sqrt, chunk_size=chunk_size,
            mesh=mesh, mesh_axis=mesh_axis,
        )
        return s.ms

    if mesh is not None:
        # multi-chip: one time-sharded smoother per pseudo-dataset (A/Q/R
        # stay shared and replicated — vmapping would force a [S, T, d, d]
        # per-sample transition tensor through the mesh)
        ms = jax.lax.map(smooth_one, Y_all)
    else:
        ms = jax.vmap(smooth_one)(Y_all)  # [S+1, T, d]
    return xprior + ms[0][None] - ms[1:]
