"""Streaming / online state-space GP inference (serving path).

The reference (`models/sde_gp.py`) is batch-only: every new observation
re-runs the filter over ALL data. A Markov GP doesn't need that — the
filtered state (m, P) at the last seen time is a sufficient statistic for
everything in the past, so new data can be assimilated in O(new steps) and
forecasts issued from the carried state alone. This module provides that
production path on top of the existing filter variants (sequential /
parallel-scan / square-root, `ops/runner.py`), with EXACT batch equivalence:
streaming over segments reproduces the full-batch filter's lml, final state
and per-step filtered moments bit-for-bit in fp64 (gated by
`tests/test_streaming.py`).

Mechanics: a segment is filtered by prepending ONE dummy step at the carried
time `t_last` — A[0] = I, Q[0] = 0 (the builder's dt_0 = 0 convention,
`ops/lgssm.build_lgssm`), an all-NaN observation row (masked update = no-op,
lml contribution 0) — and overriding the builder's stationary init with the
carried (m, P). Every downstream path (padding, chunking, sqrt refactoring)
is reused unchanged; the dummy row also avoids the offset-by-one slice
pathology (CLAUDE.md rule 9). Segment shapes are static, so a serving loop
that feeds fixed-size batches (NaN-padded) compiles exactly once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.lgssm import build_lgssm, project_mean, project_var
from ..ops.runner import run_filter
from ..utils.struct import module, replace, static
from .ssgp import GaussianMoments

__all__ = ["StreamingGP", "StreamingCVI", "StreamState", "SegmentResult"]


@module
class StreamState:
    """Carried sufficient statistic: filtered moments at the last seen time."""

    m: jnp.ndarray  # [d] filtered state mean at t_last
    P: jnp.ndarray  # [d, d] filtered state covariance at t_last
    t_last: jnp.ndarray  # [] scalar time of the carried state
    lml: jnp.ndarray  # [] accumulated log marginal likelihood so far


@module
class SegmentResult:
    """Filtered (one-sided, causal) moments over one assimilated segment."""

    f_mean: jnp.ndarray  # [B, p] filtered head means E[h(x_k) | y_{1:k}]
    f_var: jnp.ndarray  # [B, p] filtered head variances
    lml: jnp.ndarray  # [] log p(y_segment | past) — this segment's increment


@module
class StreamingGP:
    """Online wrapper around the state-space GP inference core.

    Same configuration surface as `StateSpaceGP` (kernel / likelihood /
    physics observation heads / prior mean / filter-variant flags) but no
    stored data: observations arrive through `update`, forecasts come from
    `forecast`. `StreamingGP.from_model(ssgp)` assimilates an existing
    model's training data and returns the ready-to-serve carried state.
    """

    kernel: object
    likelihood: object
    observation: object = None  # optional StateObservation (physics heads)
    mean: object = None  # optional prior mean (means/mean.py)
    parallel: bool = static(default=False)
    sqrt: bool = static(default=False)
    chunk_size: object = static(default=None)
    # Serving paths are fed by external data: when True (default), a segment
    # containing a time BEFORE the previous row (or before t_last) NaN-poisons
    # the carried state and lml, so stale/out-of-order feeds fail loudly
    # instead of silently applying negative-dt transitions. Equal times are
    # fine (dt=0 is an exact identity transition, the dummy-row convention).
    strict_times: bool = static(default=True)

    # ---- construction ----
    @classmethod
    def from_model(cls, model):
        """Wrap a `StateSpaceGP` and assimilate its training data.

        Returns (streaming_gp, state): `state` carries the filtered moments
        at `model.t[-1]`, so `forecast`/`update` continue seamlessly past
        the training window.
        """
        s = cls(
            kernel=model.kernel, likelihood=model.likelihood,
            observation=model.observation, mean=model.mean,
            parallel=model.parallel, sqrt=model.sqrt,
            chunk_size=model.chunk_size,
        )
        state = s.init_state(t0=model.t[0])
        state, _ = s.update(state, model.t, model.Y)
        return s, state

    def init_state(self, t0=0.0) -> StreamState:
        """Fresh state = the stationary prior anchored at time t0.

        For stationary kernels the anchor is irrelevant (A P∞ Aᵀ + Q = P∞
        for any dt); for non-stationary Markov kernels (Wiener family) the
        prior is defined at t = t0, so pass the true series start.
        """
        ssm = build_lgssm(self.kernel, jnp.asarray([t0]))
        return StreamState(
            m=ssm.m0, P=ssm.P0,
            t_last=jnp.asarray(t0, dtype=ssm.m0.dtype),
            lml=jnp.zeros((), ssm.m0.dtype),
        )

    # ---- internals ----
    def _segment_inputs(self, state, t, Y):
        """LGSSM over [t_last, t...] with a masked dummy row at t_last."""
        t = jnp.ravel(t)
        B = t.shape[0]
        tc = jnp.concatenate([state.t_last[None], t])
        ssm = build_lgssm(self.kernel, tc)
        if self.observation is not None:
            H = self.observation.H(self.kernel)
            if H.ndim == 3:
                raise ValueError(
                    "StreamingGP does not support time-varying observation "
                    "matrices (H [T, p, d], e.g. ScatteredSpatialHead): the "
                    "rows are tied to a fixed training grid. Use "
                    "zoo.scattered_st_predict / the batch model instead."
                )
            ssm = ssm._replace(H=H)
        ssm = ssm._replace(m0=state.m, P0=state.P)
        p = ssm.H.shape[-2]
        R = self.likelihood.R(B + 1, p)
        if R.shape[0] != B + 1:
            # e.g. BlockDiagonalGaussian stores per-step V over the TRAINING
            # grid and ignores the requested T — streaming rows would silently
            # misalign with the wrong noise covariance (or shape-error under
            # jit). Streaming needs a T-parametric likelihood.R.
            raise ValueError(
                "StreamingGP requires a likelihood whose R(T, p) is "
                f"parametric in T: requested T={B + 1} rows but got "
                f"R with leading dim {R.shape[0]}. Length-tied likelihoods "
                "(per-step covariances stored over a fixed training grid) "
                "cannot stream; use the batch model or re-slice V per "
                "segment."
            )
        corr = None
        if self.observation is not None:
            corr = self.observation.var_correction(self.kernel)
            if corr is not None:
                corr = jnp.broadcast_to(corr, (p,))
                R = R + jnp.diag(corr)[None]
        Yc = jnp.broadcast_to(jnp.asarray(Y, ssm.m0.dtype), (B, p))
        mu = None
        if self.mean is not None:
            from ..means.mean import head_mean_values

            mu = head_mean_values(
                self.mean, t, observation=self.observation, p=p
            )
            Yc = Yc - mu
        # dummy row: all-missing observation at t_last (update is a no-op,
        # lml contribution is 0; A[0]=I, Q[0]=0 keep the carried state)
        Yc = jnp.concatenate([jnp.full((1, p), jnp.nan, Yc.dtype), Yc])
        return ssm, R, Yc, mu, corr

    # ---- serving API ----
    def update(self, state: StreamState, t, Y):
        """Assimilate a segment of observations at or after t_last.

        t: [B] sorted times (all >= state.t_last; dt=0 rows are exact
        identity transitions); Y: [B, p] with NaN =
        missing (a fixed-size serving loop pads with NaN rows). Returns the
        advanced state and this segment's filtered moments + lml increment.
        """
        ssm, R, Yc, mu, corr = self._segment_inputs(state, t, Y)
        f = run_filter(
            ssm, R, Yc, parallel=self.parallel, sqrt=self.sqrt,
            chunk_size=self.chunk_size,
        )[0]
        ms, Ps = f.ms[1:], f.Ps[1:]
        f_mean = project_mean(ssm.H, ms)
        f_var = project_var(ssm.H, Ps)
        if mu is not None:
            f_mean = f_mean + mu
        if corr is not None:
            f_var = f_var + corr
        lml_inc = f.lml
        m_last = ms[-1]
        if self.strict_times:
            # [t_last, t...] must be non-decreasing; a violating row means a
            # negative dt went into transition_matrix upstream and the whole
            # segment is untrustworthy — poison it loudly. (Equal times are
            # exact: dt=0 gives A=I, Q=0.)
            tc = jnp.concatenate(
                [state.t_last[None], jnp.ravel(t).astype(state.t_last.dtype)]
            )
            bad = jnp.where(
                jnp.all(tc[1:] >= tc[:-1]), 0.0, jnp.nan
            ).astype(m_last.dtype)
            m_last = m_last + bad
            lml_inc = lml_inc + bad
        new_state = StreamState(
            m=m_last, P=Ps[-1],
            t_last=jnp.asarray(jnp.ravel(t)[-1], ms.dtype),
            lml=state.lml + lml_inc,
        )
        return new_state, SegmentResult(
            f_mean=f_mean, f_var=f_var, lml=lml_inc
        )

    def forecast(self, state: StreamState, t) -> GaussianMoments:
        """Predictive head moments at future times t (no assimilation).

        Exact: for query points after all assimilated data the smoothed,
        filtered and predicted posteriors coincide, so this matches
        `StateSpaceGP.predict_f` on the concatenated series (gated).
        """
        t = jnp.ravel(t)
        p = (self.observation.H(self.kernel).shape[-2]
             if self.observation is not None else 1)
        Y = jnp.full((t.shape[0], p), jnp.nan)
        _, seg = self.update(state, t, Y)
        return GaussianMoments(mean=seg.f_mean, var=seg.f_var)

    def predict_y(self, state: StreamState, t) -> GaussianMoments:
        """Observation-space forecast: latent moments + observation noise."""
        t = jnp.ravel(t)
        f = self.forecast(state, t)
        p = f.mean.shape[-1]
        R = self.likelihood.R(t.shape[0], p)
        if R.shape[0] != t.shape[0]:
            raise ValueError(
                "StreamingGP.predict_y requires a T-parametric likelihood.R "
                f"(requested {t.shape[0]} rows, got {R.shape[0]}); see "
                "StreamingGP.update."
            )
        return GaussianMoments(
            mean=f.mean, var=f.var + jax.vmap(jnp.diag)(R)
        )


def _carry_ssm(kernel, observation, state, t):
    """LGSSM over [t_last, t...] initialised from the carried state."""
    tc = jnp.concatenate([state.t_last[None], jnp.ravel(t)])
    ssm = build_lgssm(kernel, tc)
    if observation is not None:
        H = observation.H(kernel)
        if H.ndim == 3:
            raise ValueError(
                "streaming does not support time-varying H [T, p, d] "
                "(rows tied to a fixed training grid); use the batch model."
            )
        ssm = ssm._replace(H=H)
    return ssm._replace(m0=state.m, P0=state.P)


@module
class StreamingCVI:
    """Online CVI: assimilate NON-GAUSSIAN observation segments in O(segment).

    Streaming-variational-Bayes form of `CVIGP`: the carried filtered state
    of the conjugate surrogate is the prior for each new segment, on which a
    short natural-gradient site loop runs (`n_iters` unrolled steps); past
    sites are never revisited. With a conjugate Gaussian likelihood and
    lr = 1 the sites hit their exact fixed point, so segment ELBOs sum to
    the exact batch lml and the carry equals the batch filter state
    (gated); for genuinely non-conjugate likelihoods this is the standard
    online approximation (no backward refinement of past sites).
    """

    kernel: object
    likelihood: object  # non-conjugate data likelihood (CVIGP contract)
    observation: object = None
    mean: object = None
    parallel: bool = static(default=False)
    sqrt: bool = static(default=False)
    chunk_size: object = static(default=None)
    n_iters: int = static(default=8)
    lr: float = static(default=0.5)
    hessian: str = static(default="exact")
    strict_times: bool = static(default=True)  # see StreamingGP.strict_times

    def _segment_likelihood(self, B: int):
        """Per-segment likelihood with the dummy carry row excluded from any
        nonlinear-residual term.

        The segment's row 0 is the carried state at t_last — the FINAL data
        row of the previous segment, whose residual contribution that segment
        already counted. Enforcing the residual there again would (a)
        double-count boundary residual terms in the accumulated ELBO and
        (b) spawn a spurious collocation site (separately pinned NaN). A
        residual_mask of [0, 1, ..., 1] removes both at the source.
        """
        lik = self.likelihood
        if getattr(lik, "residual", None) is None:
            return lik
        rm = lik.residual_mask
        if rm is None:
            rm = jnp.ones(B)
        else:
            rm = jnp.ravel(jnp.asarray(rm))
            if rm.shape[0] != B:
                raise ValueError(
                    "StreamingCVI: likelihood.residual_mask must cover one "
                    f"segment ({B} rows), got {rm.shape[0]}. Supply the "
                    "per-segment mask (the dummy carry row is added "
                    "internally)."
                )
        return replace(
            lik, residual_mask=jnp.concatenate([jnp.zeros(1, rm.dtype), rm])
        )

    def init_state(self, t0=0.0) -> StreamState:
        """Fresh state = the stationary prior anchored at t0 (see
        `StreamingGP.init_state`). `lml` accumulates the segment ELBO
        increments — each a lower bound on log p(y_segment | past)."""
        ssm = build_lgssm(self.kernel, jnp.asarray([t0]))
        return StreamState(
            m=ssm.m0, P=ssm.P0,
            t_last=jnp.asarray(t0, dtype=ssm.m0.dtype),
            lml=jnp.zeros((), ssm.m0.dtype),
        )

    def update(self, state: StreamState, t, Y, key=None):
        """Assimilate one segment. Returns (state', segment_model) where
        segment_model is the fitted `CVIGP` over the segment (use its
        `posterior()` / `predict_y` for within-segment reads).

        `key`: PRNG key for stochastic (MC) ELL likelihoods, split per
        natural-gradient iteration; None keeps the frozen-seed fallback.
        """
        from .cvi_gp import CVIGP

        t = jnp.ravel(t)
        p = (self.observation.H(self.kernel).shape[-2]
             if self.observation is not None else Y.shape[-1])
        Yc = jnp.concatenate(
            [jnp.full((1, p), jnp.nan, jnp.asarray(Y).dtype),
             jnp.broadcast_to(jnp.asarray(Y), (t.shape[0], p))]
        )
        cvi = CVIGP.init(
            jnp.concatenate([state.t_last[None], t]), Yc,
            self.kernel, self._segment_likelihood(t.shape[0]),
            observation=self.observation,
            mean=self.mean, parallel=self.parallel, sqrt=self.sqrt,
            chunk_size=self.chunk_size, init_state=(state.m, state.P),
        )
        # the dummy carry row at t_last must stay site-free even when a
        # residual likelihood widens the active mask (site_active_mask) —
        # otherwise each segment would add a spurious collocation site there
        sites = cvi.sites
        cvi = replace(
            cvi, sites=replace(sites, Y=sites.Y.at[0].set(jnp.nan))
        )
        elbo = jnp.zeros((), state.m.dtype)
        for i in range(self.n_iters):  # unrolled; one compile per shape
            ki = None if key is None else jax.random.fold_in(key, i)
            cvi, elbo = cvi.step_with_elbo(self.lr, hessian=self.hessian,
                                           key=ki)
        # carry = filtered state of the surrogate under the FINAL sites
        ssm = _carry_ssm(self.kernel, self.observation, state, t)
        f = run_filter(
            ssm, cvi.sites.V, cvi.sites.Y, parallel=self.parallel,
            sqrt=self.sqrt, chunk_size=self.chunk_size,
        )[0]
        m_last = f.ms[-1]
        if self.strict_times:
            tc = jnp.concatenate(
                [state.t_last[None], t.astype(state.t_last.dtype)]
            )
            bad = jnp.where(
                jnp.all(tc[1:] >= tc[:-1]), 0.0, jnp.nan
            ).astype(m_last.dtype)
            m_last = m_last + bad
            elbo = elbo + bad
        new_state = StreamState(
            m=m_last, P=f.Ps[-1],
            t_last=jnp.asarray(t[-1], f.ms.dtype),
            lml=state.lml + elbo,
        )
        return new_state, cvi

    def forecast(self, state: StreamState, t) -> GaussianMoments:
        """Latent head moments at future times from the carried state
        (prior propagation — no sites past t_last). Push through the
        likelihood's `predict_y_moments` for observation-space forecasts."""
        t = jnp.ravel(t)
        ssm = _carry_ssm(self.kernel, self.observation, state, t)
        p = ssm.H.shape[-2]
        B = t.shape[0]
        R = jnp.broadcast_to(jnp.eye(p, dtype=state.m.dtype),
                             (B + 1, p, p))
        Y = jnp.full((B + 1, p), jnp.nan, state.m.dtype)
        f = run_filter(ssm, R, Y, parallel=self.parallel, sqrt=self.sqrt,
                       chunk_size=self.chunk_size)[0]
        mean = project_mean(ssm.H, f.ms[1:])
        var = project_var(ssm.H, f.Ps[1:])
        if self.mean is not None:
            from ..means.mean import head_mean_values

            mean = mean + head_mean_values(
                self.mean, t, observation=self.observation, p=p
            )
        if self.observation is not None:
            corr = self.observation.var_correction(self.kernel)
            if corr is not None:
                var = var + jnp.broadcast_to(corr, (p,))
        return GaussianMoments(mean=mean, var=var)
