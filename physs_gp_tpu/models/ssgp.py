"""State-space (Markov) GP regression model.

TPU-native counterpart of the reference's `models/sde_gp.py` temporal path
(`BASE_SDE_GP`/`T_SDE_GP`, ref lines 53-489): log marginal likelihood is one
Kalman-filter pass, the posterior is filter + RTS smoothing, and prediction
augments the time grid with NaN observations and re-runs the smoother
(`T_SDE_GP.predict_f`, ref `models/sde_gp.py:392`).

Everything is a pure function of the model pytree — `jax.grad(lambda m:
-m.log_marginal_likelihood())` differentiates through the scan, and the
`parallel=True` path swaps in the associative-scan filter/smoother.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..likelihoods.gaussian import Gaussian
from ..ops.lgssm import build_lgssm, project_mean, project_var
from ..ops.runner import run_filter, run_filter_smoother
from ..ops.matrix import diag_from_XDXT
from ..utils.struct import module, static

__all__ = ["StateSpaceGP", "GaussianMoments"]


class GaussianMoments(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray


@module
class StateSpaceGP:
    t: jnp.ndarray  # [T] sorted time points
    Y: jnp.ndarray  # [T, p] observations, NaN = missing
    kernel: object
    likelihood: object
    observation: object = None  # optional StateObservation (physics heads)
    mean: object = None  # optional Mean (or list per head; means/mean.py)
    parallel: bool = static(default=False)
    sqrt: bool = static(default=False)  # square-root (QR) filtering, fp32-robust
    chunk_size: object = static(default=None)
    mesh: object = static(default=None)  # jax.sharding.Mesh: time-axis sharding
    mesh_axis: str = static(default="t")

    def _mu(self, t=None) -> jnp.ndarray | None:
        """Prior-mean matrix μ [T, p] at the heads, or None for zero mean.
        Inference runs on the centred residual Y − μ (ref `means/mean.py`:
        the prior mean shifts the observed process by L[μ])."""
        if self.mean is None:
            return None
        from ..means.mean import head_mean_values

        return head_mean_values(
            self.mean, self.t if t is None else t,
            observation=self.observation, p=self.Y.shape[1],
        )

    # ---- internals ----
    def _filter_inputs(self):
        ssm = build_lgssm(self.kernel, self.t)
        if self.observation is not None:
            ssm = ssm._replace(H=self.observation.H(self.kernel))
        T = self.Y.shape[0]
        p = ssm.H.shape[-2]
        R = self.likelihood.R(T, p)
        if self.observation is not None:
            corr = self.observation.var_correction(self.kernel)
            if corr is not None:
                # off-site heads: conditional-variance residual folded into
                # the observation noise (exact sparse marginal; see
                # transforms.operators.SpatialHead.var_correction)
                corr = jnp.broadcast_to(corr, (T, p))
                R = R + jax.vmap(jnp.diag)(corr)
        return ssm, R

    # ---- public API (mirrors ref `core/models.py:108-118` surface) ----
    def log_marginal_likelihood(self) -> jnp.ndarray:
        ssm, R = self._filter_inputs()
        mu = self._mu()
        Yc = self.Y if mu is None else self.Y - mu
        if self.mesh is not None:
            f, _ = run_filter_smoother(
                ssm, R, Yc, sqrt=self.sqrt, chunk_size=self.chunk_size,
                mesh=self.mesh, mesh_axis=self.mesh_axis,
            )
        else:
            f, _ = run_filter(
                ssm, R, Yc, parallel=self.parallel, sqrt=self.sqrt,
                chunk_size=self.chunk_size,
            )
        return f.lml

    def get_objective(self) -> jnp.ndarray:
        return -self.log_marginal_likelihood()

    def filter_smooth(self, Y=None):
        ssm, R = self._filter_inputs()
        if Y is None:
            mu = self._mu()
            Y = self.Y if mu is None else self.Y - mu
        f, s = run_filter_smoother(
            ssm, R, Y, parallel=self.parallel,
            sqrt=self.sqrt, chunk_size=self.chunk_size, mesh=self.mesh,
            mesh_axis=self.mesh_axis,
        )
        return ssm, f, s

    def posterior(self) -> GaussianMoments:
        """Smoothed q(f) marginals at the training times: [T, p] mean/var."""
        ssm, _, s = self.filter_smooth()
        mean = project_mean(ssm.H, s.ms)
        var = project_var(ssm.H, s.Ps)
        mu = self._mu()
        if mu is not None:
            mean = mean + mu
        if self.observation is not None:
            corr = self.observation.var_correction(self.kernel)
            if corr is not None:
                var = var + corr
        return GaussianMoments(mean=mean, var=var)

    def posterior_blocks(self):
        """Full smoothed state posterior (m [T,d], P [T,d,d]) + lml."""
        ssm, f, s = self.filter_smooth()
        return s.ms, s.Ps, f.lml

    def predict_f(self, t_new: jnp.ndarray) -> GaussianMoments:
        """Posterior at new time points: augment grid with NaN observations,
        re-sort, filter+smooth, unsort (ref `models/sde_gp.py:392`)."""
        t_new = jnp.ravel(t_new)
        n_new = t_new.shape[0]
        T, p = self.Y.shape
        corr = None
        if self.observation is not None:
            if self.observation.H(self.kernel).ndim == 3:
                raise ValueError(
                    "predict_f does not support time-varying observation "
                    "operators (H [T, Ng, d], e.g. ScatteredSpatialHead): the "
                    "training H cannot be reused on the augmented time grid. "
                    "Use physs_gp_tpu.zoo.scattered_st_predict instead."
                )
            corr = self.observation.var_correction(self.kernel)
        t_all = jnp.concatenate([self.t, t_new])
        mu = self._mu()
        Yc = self.Y if mu is None else self.Y - mu
        Y_all = jnp.concatenate(
            [Yc, jnp.full((n_new, p), jnp.nan, self.Y.dtype)]
        )
        # pad the observation covariance with identity blocks at test points
        # (masked anyway; ref `models/sde_gp.py:493` get_likelihood_for_prediction)
        R_train = self.likelihood.R(T, p)
        if corr is not None:
            # same off-site conditional-variance fold-in as _filter_inputs —
            # training rows must condition on the noise model used by the lml
            R_train = R_train + jax.vmap(jnp.diag)(
                jnp.broadcast_to(corr, (T, p))
            )
        R_all = jnp.concatenate(
            [R_train, jnp.broadcast_to(jnp.eye(p, dtype=R_train.dtype),
                                       (n_new, p, p))]
        )
        order = jnp.argsort(t_all, stable=True)
        inv = jnp.argsort(order)
        m_aug = StateSpaceGPView(
            t=t_all[order], Y=Y_all[order], R=R_all[order], base=self
        )
        ssm, _, s = m_aug.filter_smooth()
        mean = (s.ms @ ssm.H.T)[inv][self.t.shape[0]:]
        var = jax.vmap(lambda P: diag_from_XDXT(ssm.H, P))(s.Ps)[inv][
            self.t.shape[0]:
        ]
        if mu is not None:
            mean = mean + self._mu(t=t_new)
        if corr is not None:
            # predictions marginalise over the off-site conditional residual
            # too, mirroring posterior()
            var = var + corr
        return GaussianMoments(mean=mean, var=var)

    def predict_y(self, t_new: jnp.ndarray) -> GaussianMoments:
        f = self.predict_f(t_new)
        if isinstance(self.likelihood, Gaussian):
            return GaussianMoments(f.mean, f.var + self.likelihood.variance.value)
        return f

    def sample_f(self, key, n_samples: int, t_new=None) -> jnp.ndarray:
        """JOINT posterior sample paths of the heads, [S, T*, p] — Matheron
        pathwise conditioning (ref `models/vgp.py:284` samples surface):
        prior trajectories by parallel affine scan + one vmapped smoother
        pass (`ops/sampling.py`). `t_new=None` samples at the training
        times; otherwise at `t_new` (augmented-grid smoother, like
        `predict_f`). Joint over time — credible bands of path functionals
        (extrema, crossings, integrals) that marginal vars cannot give.
        Off-site heads (`var_correction`) get their conditional residual as
        an independent per-row draw, matching `posterior()`/`predict_f`
        variances.
        """
        from ..ops.sampling import matheron_state_samples

        key, k_corr = jax.random.split(key)
        ssm, R = self._filter_inputs()
        mu = self._mu()
        Yc = self.Y if mu is None else self.Y - mu
        t_eval = None
        if t_new is not None:
            if ssm.H.ndim == 3:
                raise ValueError(
                    "sample_f at new times does not support time-varying "
                    "observation operators; sample on the training grid or "
                    "use zoo.scattered_st_predict for moments."
                )
            t_new = jnp.ravel(t_new)
            T, p = self.Y.shape
            t_all = jnp.concatenate([self.t, t_new])
            Y_all = jnp.concatenate(
                [Yc, jnp.full((t_new.shape[0], p), jnp.nan, self.Y.dtype)]
            )
            R_all = jnp.concatenate(
                [R, jnp.broadcast_to(jnp.eye(p, dtype=R.dtype),
                                     (t_new.shape[0], p, p))]
            )
            order = jnp.argsort(t_all, stable=True)
            inv = jnp.argsort(order)
            ssm = build_lgssm(self.kernel, t_all[order])
            if self.observation is not None:
                ssm = ssm._replace(H=self.observation.H(self.kernel))
            Yc, R = Y_all[order], R_all[order]
            t_eval = (inv, self.t.shape[0])
        xs = matheron_state_samples(
            key, ssm, R, Yc, n_samples, parallel=self.parallel,
            sqrt=self.sqrt, chunk_size=self.chunk_size, mesh=self.mesh,
            mesh_axis=self.mesh_axis,
        )  # [S, T*, d]
        f = jax.vmap(lambda x: project_mean(ssm.H, x))(xs)
        if t_eval is not None:
            inv, T0 = t_eval
            f = f[:, inv][:, T0:]
            if mu is not None:
                f = f + self._mu(t=t_new)[None]
        elif mu is not None:
            f = f + mu[None]
        if self.observation is not None:
            corr = self.observation.var_correction(self.kernel)
            if corr is not None:
                # sample the off-site conditional residual (posterior() adds
                # corr to var; sampled paths must carry the same dispersion)
                sd = jnp.sqrt(jnp.broadcast_to(corr, f.shape[1:]))
                f = f + sd * jax.random.normal(k_corr, f.shape, f.dtype)
        return f


@module
class StateSpaceGPView:
    """Internal: the base model re-pointed at an augmented (t, Y, R) grid."""

    t: jnp.ndarray
    Y: jnp.ndarray
    R: jnp.ndarray
    base: StateSpaceGP

    def filter_smooth(self):
        ssm = build_lgssm(self.base.kernel, self.t)
        if self.base.observation is not None:
            ssm = ssm._replace(H=self.base.observation.H(self.base.kernel))
        f, s = run_filter_smoother(
            ssm, self.R, self.Y, parallel=self.base.parallel,
            sqrt=self.base.sqrt, chunk_size=self.base.chunk_size,
            mesh=self.base.mesh, mesh_axis=self.base.mesh_axis,
        )
        return ssm, f, s
