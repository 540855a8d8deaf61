"""CVI state-space GP: variational inference with a conjugate surrogate model.

Counterpart of the reference's `VGP` + `FullConjugateGaussian` route
(`models/vgp.py:27`, `approximate_posteriors/conjugate_gaussian_approximate_posterior.py:174`,
ELBO at `computation/elbos/elbos.py:163-194`): the approximate posterior is a
*surrogate* state-space GP whose pseudo-likelihood sites (Ỹ, Ṽ) are updated
by natural gradients, and the ELBO is

    ELBO = ELL_data(q) - ELL_sites(q) + lml_surrogate,

computed from ONE Kalman filter+smoother pass over the surrogate. The whole
step (filter, smooth, ELL, natural-gradient site update) is a single jitted
graph; `parallel=True` swaps in the associative-scan filters.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..approx.cvi import Sites, init_sites, natgrad_update
from ..likelihoods.gaussian import BlockDiagonalGaussian
from ..likelihoods.nongaussian import expected_log_lik
from ..ops.gaussian import mask_covariance
from ..ops.lgssm import (
    build_lgssm,
    project_cov,
    project_cov_factor,
    project_mean,
)
from ..ops.runner import run_filter_smoother
from ..ops.matrix import psd_solve_logdet
from ..utils.struct import module, replace, static
from .ssgp import GaussianMoments

__all__ = ["CVIGP"]

_LOG2PI = math.log(2.0 * math.pi)


@module
class CVIGP:
    t: jnp.ndarray  # [T] sorted time points
    Y: jnp.ndarray  # [T, p] data (NaN = missing)
    kernel: object
    likelihood: object  # non-conjugate data likelihood (elementwise)
    sites: Sites
    observation: object = None  # optional StateObservation (physics heads)
    mean: object = None  # optional prior Mean (see means/mean.py)
    init_state: object = None  # optional (m0, P0) filter-init override —
    # streaming/online CVI carries the previous segment's filtered state
    # here instead of the stationary prior (models/streaming.py)
    parallel: bool = static(default=False)
    sqrt: bool = static(default=False)
    chunk_size: object = static(default=None)
    mesh: object = static(default=None)  # jax.sharding.Mesh: time-axis sharding
    mesh_axis: str = static(default="t")

    # ---- construction ----
    @classmethod
    def init(cls, t, Y, kernel, likelihood, observation=None, mean=None,
             parallel=False, sqrt=False, chunk_size=None,
             site_var: float = 1.0, mesh=None, mesh_axis: str = "t",
             init_state=None):
        # Likelihoods with residual terms widen the active-site mask so
        # never-directly-observed heads still carry sites (full-state-observed
        # surrogate, ref `conjugate_gaussian_approximate_posterior.py:174`).
        active = (
            likelihood.site_active_mask(Y)
            if hasattr(likelihood, "site_active_mask")
            else None
        )
        return cls(
            t=jnp.ravel(t),
            Y=Y,
            kernel=kernel,
            likelihood=likelihood,
            sites=init_sites(Y, site_var, active=active),
            observation=observation,
            mean=mean,
            init_state=init_state,
            parallel=parallel,
            sqrt=sqrt,
            chunk_size=chunk_size,
            mesh=mesh,
            mesh_axis=mesh_axis,
        )

    # ---- surrogate filtering ----
    def _surrogate_pass(self):
        """Filter+smooth the surrogate model; return (lml, m, S) with the
        q(f) block moments [T, p], [T, p, p] (H-projected)."""
        ssm = build_lgssm(self.kernel, self.t)
        if self.observation is not None:
            ssm = ssm._replace(H=self.observation.H(self.kernel))
        if self.init_state is not None:
            ssm = ssm._replace(m0=self.init_state[0], P0=self.init_state[1])
        T, p = self.sites.Y.shape
        R = self.sites.V
        f, s = run_filter_smoother(
            ssm, R, self.sites.Y, parallel=self.parallel, sqrt=self.sqrt,
            chunk_size=self.chunk_size, mesh=self.mesh,
            mesh_axis=self.mesh_axis,
        )
        m = project_mean(ssm.H, s.ms)  # [T, p]
        # sqrt runners ship the smoothed covariance factor: (H L)(H L)^T is
        # PSD by construction in fp32, where H P H^T goes indefinite at the
        # state-error scale once site variances tighten (TPU MC-ELL NaNs)
        if s.Ls is not None:
            S = project_cov_factor(ssm.H, s.Ls)  # [T, p, p]
        else:
            S = project_cov(ssm.H, s.Ps)  # [T, p, p]
        return f.lml, m, S

    # ---- ELL terms ----
    def _mu(self) -> jnp.ndarray | None:
        """Prior mean μ [T, p] at the heads; the zero-mean surrogate carries
        the deviation and the data likelihood sees f = f₀ + μ (the reference
        shifts the likelihood, not the sites)."""
        if self.mean is None:
            return None
        from ..means.mean import head_mean_values

        return head_mean_values(
            self.mean, self.t, observation=self.observation,
            p=self.Y.shape[1],
        )

    def _ell_data(self, m, S, key=None):
        mu = self._mu()
        if mu is not None:
            m = m + mu
        if self.observation is not None:
            corr = self.observation.var_correction(self.kernel)
            if corr is not None:
                # off-site heads: q(f(s)) marginal var = H P H^T + ρ(s)
                # (spatial conditional inside the ELL, ref
                # `computation/spatial_conditionals.py:30`); the surrogate
                # filter and the site ELL see the state heads directly.
                T, p = m.shape
                corr = jnp.broadcast_to(corr, (T, p))
                S = S + jax.vmap(jnp.diag)(corr)
        if hasattr(self.likelihood, "expected_log_lik_blocks"):
            # block likelihoods: Composite (per-column heads + residuals),
            # DynamicCovarianceGaussian (joint y_t ~ N(0, Σ(f_t))), ...
            return self.likelihood.expected_log_lik_blocks(
                self.Y, m, S, key=key
            )
        v = jnp.diagonal(S, axis1=-2, axis2=-1)
        return jnp.sum(expected_log_lik(self.likelihood, self.Y, m, v))

    def _ell_sites(self, m, S):
        """sum_t E_q[log N(Ỹ_t | f_t, Ṽ_t)] over ACTIVE site elements.

        Per-element masking (not per-row): a timestep where some heads are
        active and others are not contributes exactly its active sub-block —
        matching the filters' per-element masking, so every term the surrogate
        lml counts is also counted here (ragged multi-head models were biased
        by the old all-or-nothing row mask).

        One fused inverse+logdet pass serves the logpdf's Mahalanobis term,
        its logdet AND the trace term (they used to run two separate Pallas
        solve passes over the [T, p, p] blocks — the T-wide solves are the
        whole cost here; the remaining contractions are elementwise)."""
        return self._ell_sites_ex(m, S)[0]

    def _ell_sites_ex(self, m, S):
        """(_ell_sites value, (λ1, λ2)) — the site inverse computed for the
        ELL doubles as the natural parameters `natgrad_update` needs, so the
        single-pass CVI step skips `to_natural`'s own [T, p, p] inversion.

        λ from the MASKED inverse pins inactive (NaN-site) elements at unit
        precision instead of tracking their decayed raw value — immaterial:
        inactive site rows are decoupled (their ELL gradients are zero) and
        the filter masks them out of every result."""
        ok = jnp.isfinite(self.sites.Y).astype(m.dtype)  # [T, p]
        p = m.shape[-1]
        Vm = mask_covariance(self.sites.V, ok)
        eye = jnp.broadcast_to(jnp.eye(p, dtype=m.dtype), Vm.shape)
        Vinv, logdet = psd_solve_logdet(Vm, eye)
        y0 = jnp.where(ok > 0, jnp.nan_to_num(self.sites.Y), 0.0)
        diff = y0 - m * ok
        maha = jnp.einsum("ti,tij,tj->t", diff, Vinv, diff)
        n_obs = jnp.sum(ok, -1)
        logpdf = -0.5 * (maha + logdet + n_obs * _LOG2PI)
        # trace over the active sub-block: tr(Vm^-1 Sm) elementwise
        Sm = S * (ok[..., :, None] * ok[..., None, :])
        tr = jnp.sum(Vinv * Sm, (-1, -2))
        value = jnp.sum(logpdf) - 0.5 * jnp.sum(tr)
        lam1 = jnp.einsum("tij,tj->ti", Vinv, y0)
        lam2 = -0.5 * Vinv
        return value, (lam1, lam2)

    # ---- public API ----
    def elbo(self, key=None) -> jnp.ndarray:
        """key: PRNG key for stochastic (MC) ELL terms; None = frozen seed."""
        lml_sur, m, S = self._surrogate_pass()
        return self._ell_data(m, S, key=key) - self._ell_sites(m, S) + lml_sur

    def get_objective(self, key=None) -> jnp.ndarray:
        return -self.elbo(key=key)

    def _site_grads(self, m, S, hessian: str, key=None):
        """(g1, g2) of the data ELL; hessian='gauss_newton' uses the PSD-safe
        GN form for residual terms (ref `cvi_hessian_approximations.py`)."""
        if hessian != "exact" and hasattr(self.likelihood, "natgrad_moments"):
            return self.likelihood.natgrad_moments(
                self.Y, m, S, residual_hessian=hessian, key=key
            )
        return None  # natgrad_update autodiffs the exact ELL

    def natural_gradient_update(self, lr: float, hessian: str = "exact",
                                key=None) -> "CVIGP":
        """One CVI step on all sites (ref `cvi_nat_grad.py:346-410`).

        `key` refreshes the MC noise in stochastic ELL terms each call; the
        key stays OUTSIDE the differentiated arguments (closed over), so
        jax.grad never sees a uint32 leaf."""
        _, m, S = self._surrogate_pass()
        new_sites = natgrad_update(
            self.sites, m, S, lambda mm, SS: self._ell_data(mm, SS, key=key),
            lr, grads=self._site_grads(m, S, hessian, key=key),
        )
        return replace(self, sites=new_sites)

    def step_with_elbo(self, lr: float, hessian: str = "exact", key=None):
        """One CVI step + the (pre-update) ELBO from a SINGLE surrogate
        filter+smoother pass — use this in training loops instead of
        natural_gradient_update + elbo, which would run the pass twice.

        Pass a fresh `key` per iteration for unbiased stochastic (MC) ELLs;
        the reported ELBO and the site gradients share the same samples."""
        lml_sur, m, S = self._surrogate_pass()
        ell_sites, naturals = self._ell_sites_ex(m, S)
        elbo = self._ell_data(m, S, key=key) - ell_sites + lml_sur
        new_sites = natgrad_update(
            self.sites, m, S, lambda mm, SS: self._ell_data(mm, SS, key=key),
            lr, grads=self._site_grads(m, S, hessian, key=key),
            naturals=naturals,
        )
        return replace(self, sites=new_sites), elbo

    def posterior(self) -> GaussianMoments:
        _, m, S = self._surrogate_pass()
        mu = self._mu()
        if mu is not None:
            m = m + mu
        return GaussianMoments(mean=m, var=jnp.diagonal(S, axis1=-2, axis2=-1))

    def surrogate_model(self):
        """The conjugate surrogate as a `StateSpaceGP` (pseudo-observations
        = the CVI sites) — its smoothed posterior IS q; prediction helpers
        that need `filter_smooth` (e.g. `zoo.helmholtz_st_predict`) run on
        this."""
        from .ssgp import StateSpaceGP

        return StateSpaceGP(
            t=self.t,
            Y=self.sites.Y,
            kernel=self.kernel,
            likelihood=BlockDiagonalGaussian(V=self.sites.V),
            observation=self.observation,
            parallel=self.parallel,
            sqrt=self.sqrt,
            chunk_size=self.chunk_size,
            mesh=self.mesh,
            mesh_axis=self.mesh_axis,
        )

    def sample_f(self, key, n_samples: int, t_new=None):
        """JOINT posterior sample paths [S, T*, p]: q(f) is the surrogate's
        smoothed posterior, so sampling delegates to the surrogate
        `StateSpaceGP.sample_f` (Matheron pathwise conditioning)."""
        return self.surrogate_model().sample_f(key, n_samples, t_new=t_new)

    def predict_f(self, t_new) -> GaussianMoments:
        """q(f) at new inputs via the surrogate's NaN-augmentation path."""
        out = self.surrogate_model().predict_f(t_new)
        if self.mean is not None:
            from ..means.mean import head_mean_values

            mu_new = head_mean_values(
                self.mean, jnp.ravel(t_new), observation=self.observation,
                p=self.Y.shape[1],
            )
            out = GaussianMoments(mean=out.mean + mu_new, var=out.var)
        return out

    def predict_y(self, t_new, gh_points: int = 20) -> GaussianMoments:
        """Moment-matched predictive p(y*) (ref `y_predictors.py`).

        Composite (multi-head) likelihoods route per head — column h of q(f)
        through head h's conditional moments (ref product-likelihood dispatch
        `dispatched_ell.py:356-649`); the residual term is excluded."""
        from ..ops.quadrature import expect_gh

        f = self.predict_f(t_new)
        lik = self.likelihood
        if hasattr(lik, "predict_y_moments"):
            ey, vy = lik.predict_y_moments(f.mean, f.var, gh_points)
            return GaussianMoments(mean=ey, var=vy)
        ey = expect_gh(lik.conditional_mean, f.mean, f.var, gh_points)
        ey2 = expect_gh(
            lambda ff: lik.conditional_variance(ff) + lik.conditional_mean(ff) ** 2,
            f.mean,
            f.var,
            gh_points,
        )
        return GaussianMoments(mean=ey, var=ey2 - ey**2)

    def nlpd(self, t_new, y_new, gh_points: int = 20) -> jnp.ndarray:
        """Negative log predictive density via Gauss-Hermite quadrature
        (ref `metrics/nlpd.py:44`), averaged over finite y elements.

        Composite likelihoods evaluate each head's own predictive density on
        its column; NaN y elements (e.g. constraint-only heads) drop out."""
        from ..ops.quadrature import expect_gh

        from ..ops.quadrature import expect_gh_log

        f = self.predict_f(t_new)
        y_new = jnp.reshape(y_new, f.mean.shape)  # [T, p], strict
        if hasattr(self.likelihood, "predictive_log_density"):
            # log-domain quadrature: exp(log_prob) underflows fp32 at
            # logpdf < -88, which turned TPU NLPDs into +inf
            val = -self.likelihood.predictive_log_density(
                y_new, f.mean, f.var, gh_points
            )
        elif hasattr(self.likelihood, "predictive_density"):
            pd = self.likelihood.predictive_density(
                y_new, f.mean, f.var, gh_points
            )
            val = -jnp.log(jnp.maximum(pd, jnp.finfo(pd.dtype).tiny))
        else:
            val = -expect_gh_log(
                lambda ff: self.likelihood.log_prob(
                    jnp.nan_to_num(y_new)[..., None], ff
                ),
                f.mean,
                f.var,
                gh_points,
            )
        ok = jnp.isfinite(y_new)
        return jnp.sum(jnp.where(ok, val, 0.0)) / jnp.sum(ok)
