"""Nonlinear state-space GP via extended Kalman filtering.

Counterpart of the reference's EKF-in-prior route (`m_pigp_ekf` experiment,
`transforms/pdes.py` TaylorLinearizedDE + `kalman_filter.py:245` EKF
dispatch): the prior is a nonlinear SDE (pendulum, Lorenz, Lotka-Volterra —
ref `transforms/pdes.py:223-1127`, `transforms/latent_force.py`), observed
through a (possibly nonlinear) measurement function.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.ekf import (
    NonlinearSSM,
    ekf_filter,
    ekf_smoother,
    iterated_parallel_ekf_smoother,
)
from ..utils.struct import module, static
from .ssgp import GaussianMoments

__all__ = ["NonlinearSSGP"]


@module
class NonlinearSSGP:
    """EKF/EKS inference for y_t = obs_fn(x_t) + noise, dx = drift(x)dt + LdW.

    drift/obs_fn may close over trainable Params by being methods of pytree
    modules passed in `params` (they are called as drift(params, x))."""

    t: jnp.ndarray  # [T]
    Y: jnp.ndarray  # [T, p]
    params: object  # pytree of Params available to drift/obs_fn
    L: jnp.ndarray  # [d, w]
    Qc: jnp.ndarray  # [w, w]
    m0: jnp.ndarray
    P0: jnp.ndarray
    R: jnp.ndarray  # [T, p, p] observation covariances
    drift: Callable = static(default=None)  # (params, x) -> dx/dt
    obs_fn: Callable = static(default=None)  # (params, x) -> [p]
    n_substeps: int = static(default=1)
    method: str = static(default="ekf")  # 'ekf' | 'iterated_parallel'
    n_iters: int = static(default=5)
    chunk_size: object = static(default=None)

    def _ssm(self) -> NonlinearSSM:
        return NonlinearSSM(
            drift=lambda x: self.drift(self.params, x),
            L=self.L,
            Qc=self.Qc,
            m0=self.m0,
            P0=self.P0,
            obs_fn=lambda x: self.obs_fn(self.params, x),
        )

    def filter_smooth(self):
        ssm = self._ssm()
        if self.method == "iterated_parallel":
            return iterated_parallel_ekf_smoother(
                ssm, self.t, self.R, self.Y, n_iters=self.n_iters,
                n_substeps=self.n_substeps, chunk_size=self.chunk_size,
            )
        f = ekf_filter(ssm, self.t, self.R, self.Y, n_substeps=self.n_substeps)
        s = ekf_smoother(ssm, self.t, f, n_substeps=self.n_substeps)
        return f, s

    def log_marginal_likelihood(self) -> jnp.ndarray:
        f, _ = self.filter_smooth()
        return f.lml

    def get_objective(self) -> jnp.ndarray:
        return -self.log_marginal_likelihood()

    def posterior_states(self):
        """Smoothed state trajectory (m [T, d], P [T, d, d])."""
        _, s = self.filter_smooth()
        return s.ms, s.Ps

    def posterior(self) -> GaussianMoments:
        """Smoothed observation-space moments (linearised)."""
        _, s = self.filter_smooth()
        h = jax.vmap(lambda m: self.obs_fn(self.params, m))(s.ms)
        Hs = jax.vmap(lambda m: jax.jacfwd(
            lambda x: self.obs_fn(self.params, x))(m))(s.ms)
        var = jnp.einsum("tpi,tij,tpj->tp", Hs, s.Ps, Hs)
        return GaussianMoments(mean=h, var=var)
