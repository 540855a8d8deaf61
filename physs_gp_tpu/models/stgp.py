"""Spatio-temporal state-space GP with Kronecker spatial conditionals.

TPU-native counterpart of the reference's `ST_SDE_GP` (`models/sde_gp.py:490`,
prediction via `predict_temporal` :535 + `spatial_conditional` :882,
`computation/spatial_conditionals.py:30`): filtering runs over the Kron-lifted
state (temporal Markov blocks at Ns spatial sites), prediction at new space
points is a linear read-out w(s*) ⊗ h_t of the smoothed states plus the
separable conditional-variance correction.

Physics (BASELINE config 5 — 2D advection-diffusion/heat): PDE residual rows
are STOperatorHead observations; see `transforms/operators.py`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..kernels.markov import to_ss
from ..ops.matrix import diag_from_XDXT, highest_precision
from ..transforms.operators import SpatialHead, StateObservation, derivative_row
from ..utils.struct import module, replace, static
from .ssgp import GaussianMoments, StateSpaceGP

__all__ = ["SpatioTemporalGP"]


@module
class SpatioTemporalGP:
    """Wrapper: a StateSpaceGP over the Kron-lifted system + spatial reads.

    core.Y layout: [T, p] where the first Ns columns are grid observations
    (NaN where missing) and further columns come from extra heads
    (collocation rows etc.).
    """

    core: StateSpaceGP

    @classmethod
    def build(
        cls,
        t,
        Y_grid,
        st_kernel,
        likelihood,
        extra_heads: list | None = None,
        extra_Y=None,
        parallel: bool = False,
        sqrt: bool = False,
        chunk_size=None,
    ) -> "SpatioTemporalGP":
        """t [T]; Y_grid [T, Ns] observations on the kernel's spatial sites Z
        (NaN = missing). extra_heads: additional observation heads (physics);
        extra_Y [T, n_extra] their targets (0 for residuals; NaN = off)."""
        heads = [SpatialHead(points=st_kernel.sites)]
        Y = Y_grid
        if extra_heads:
            heads = heads + list(extra_heads)
            Y = jnp.concatenate([Y_grid, extra_Y], axis=1)
        obs = StateObservation(heads=heads)
        core = StateSpaceGP(
            t=jnp.ravel(t),
            Y=Y,
            kernel=st_kernel,
            likelihood=likelihood,
            observation=obs,
            parallel=parallel,
            sqrt=sqrt,
            chunk_size=chunk_size,
        )
        return cls(core=core)

    # ---- passthroughs ----
    def log_marginal_likelihood(self):
        return self.core.log_marginal_likelihood()

    def get_objective(self):
        return self.core.get_objective()

    def posterior(self) -> GaussianMoments:
        return self.core.posterior()

    @property
    def kernel(self):
        return self.core.kernel

    # ---- spatio-temporal prediction ----
    def predict_grid(self, s_new, t_new=None) -> GaussianMoments:
        """q(f) at new spatial points x (training or new) times.

        Returns moments [Nt, N*] where Nt = len(t_new or training grid).
        (ref `ST_SDE_GP.predict_f` `models/sde_gp.py:882`)
        """
        return highest_precision(self._predict_grid_impl)(s_new, t_new)

    def _predict_grid_impl(self, s_new, t_new):
        kern = self.core.kernel
        from ..utils.shapes import as_points

        s_new = as_points(s_new)
        if t_new is None:
            _, _, s = self.core.filter_smooth()
            ms, Ps = s.ms, s.Ps
            keep = slice(None)
        else:
            # augment the time axis with NaN observation rows
            t_new = jnp.ravel(t_new)
            T, p = self.core.Y.shape
            n_new = t_new.shape[0]
            t_all = jnp.concatenate([self.core.t, t_new])
            Y_all = jnp.concatenate(
                [self.core.Y, jnp.full((n_new, p), jnp.nan, self.core.Y.dtype)]
            )
            order = jnp.argsort(t_all, stable=True)
            inv = jnp.argsort(order)
            aug = replace(self.core, t=t_all[order], Y=Y_all[order])
            _, _, s = aug.filter_smooth()
            ms, Ps = s.ms[inv], s.Ps[inv]
            keep = slice(T, None)
            ms, Ps = ms[keep], Ps[keep]
            keep = slice(None)

        w = kern.spatial_weights(s_new)  # [N*, Ns]
        t_row = derivative_row(kern.k_time, 0)  # [d]
        H_new = jnp.einsum("ns,d->nsd", w, t_row).reshape(
            s_new.shape[0], -1
        )  # [N*, Ns*d]
        mean = ms @ H_new.T  # [Nt, N*]
        var = jax.vmap(lambda P: diag_from_XDXT(H_new, P))(Ps)
        var = var + kern.conditional_var_correction(s_new)[None, :]
        return GaussianMoments(mean=mean, var=var)
