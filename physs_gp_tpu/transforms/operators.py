"""Physics as linear observation operators over the Markov state.

TPU-native reformulation of the reference's physics stack. The reference
builds a joint prior over (f, ∂f, ∂²f, ...) with autodiff derivative kernels
(`transforms/pdes.py:16` DifferentialOperatorJoint, `kernels/diff_op.py`) and
then observes PDE residuals as pseudo-observations through the filter
(`computation/filters/kalman_filter.py:341-427`) or the ELL.

Key structural fact this module exploits: a Matérn(p+1/2) Markov state *is*
(f, f', ..., f^(p)) — time derivatives are already state coordinates, and any
LINEAR differential operator in time is therefore a constant row vector over
the state. Physics constraints (damped oscillators, heat/advection-diffusion
time terms, monotonicity heads) become extra rows of the observation matrix H
with their own noise — no EKF, no derivative-kernel algebra, and both the
sequential and PARALLEL scans stay exact.

(Nonlinear residuals — Allen-Cahn's f³, pendulum's sin f — enter through the
CVI expected-log-likelihood instead; see `likelihoods/composite.py`.)
"""
from __future__ import annotations

import jax.numpy as jnp

from ..kernels.base import SumKernel
from ..kernels.matern import Matern
from ..utils.params import Param
from ..utils.struct import field, module, static

__all__ = [
    "derivative_row",
    "ValueHead",
    "DerivativeHead",
    "LinearOperatorHead",
    "StateObservation",
    "SpatialHead",
    "ScatteredSpatialHead",
    "OperatorTerm",
    "STOperatorHead",
    "StackedHead",
    "MixedValueHead",
]


def derivative_row(kernel, order: int) -> jnp.ndarray:
    """Row vector w s.t. f^(order)(t) = w @ state(t). Composes over sums."""
    if isinstance(kernel, SumKernel):
        return jnp.concatenate([derivative_row(k, order) for k in kernel.parts])
    if isinstance(kernel, Matern):
        d = kernel.p + 1
        if order >= d:
            raise ValueError(
                f"Matérn(p={kernel.p}) state holds derivatives up to order "
                f"{kernel.p}; requested {order}. Use a smoother kernel."
            )
        # balanced state (kernels/matern.py): f^(k) = lam^k * x̃_k
        lam = kernel._lam
        dtype = kernel.lengthscales.raw.dtype
        return jnp.zeros((d,), dtype).at[order].set(
            jnp.asarray(lam, dtype) ** order
        )
    # generic Markov kernel: assume canonical (f, f', ...) state up to dim
    ss = kernel.to_ss()
    d = ss.state_dim
    if order >= d:
        raise ValueError(f"state dim {d} has no order-{order} derivative")
    return jnp.zeros((d,), ss.F.dtype).at[order].set(1.0)


class Head:
    """Marker base for observation heads."""


@module
class ValueHead(Head):
    """Observe f itself."""

    def row(self, kernel) -> jnp.ndarray:
        return derivative_row(kernel, 0)


@module
class DerivativeHead(Head):
    """Observe f^(order) — e.g. monotonicity heads observe f' (ref:
    monotonic_timeseries experiment, `zoo/sde_diff.py` time_diff)."""

    order: int = static(default=1)

    def row(self, kernel) -> jnp.ndarray:
        return derivative_row(kernel, self.order)


@module
class LinearOperatorHead(Head):
    """Observe L[f] = sum_k c_k f^(k) — a linear ODE residual.

    E.g. damped oscillator: L[f] = f'' + c f' + k f observed as 0 at
    collocation points (ref: `transforms/pdes.py` DampedPendulum linear case,
    experiments/pendulum). Coefficients may be trainable Params (unknown
    physics parameters are learned jointly).
    """

    coeffs: list = field(default_factory=list)  # entry k: coeff of f^(k)

    def row(self, kernel) -> jnp.ndarray:
        rows = []
        for k, c in enumerate(self.coeffs):
            cv = c.value if isinstance(c, Param) else c
            rows.append(cv * derivative_row(kernel, k))
        return sum(rows)


@module
class StateObservation:
    """Observation matrix builder: H [n_obs, d_state] stacked from heads.

    Plugs into StateSpaceGP/CVIGP via their `observation` field, replacing the
    kernel's default H = "observe f". Heads contribute one row (`row`) or a
    block of rows (`rows`, e.g. spatial heads over many points)."""

    heads: list = field(default_factory=list)

    def H(self, kernel) -> jnp.ndarray:
        from ..ops.matrix import highest_precision

        # full fp32 matmul precision: spatial-conditional weights solve
        # against a near-singular Kzz — bf16 MXU inputs NaN the cholesky
        # (this runs OUTSIDE the filters' own highest_precision scope).
        return highest_precision(self._H_impl)(kernel)

    def _H_impl(self, kernel) -> jnp.ndarray:
        blocks = []
        for h in self.heads:
            if hasattr(h, "rows"):
                blocks.append(h.rows(kernel))
            else:
                blocks.append(h.row(kernel)[None, :])
        if any(b.ndim == 3 for b in blocks):
            # time-varying heads (scattered data): broadcast static blocks
            # over T and stack to H [T, p, d]
            T = next(b.shape[0] for b in blocks if b.ndim == 3)
            blocks = [
                b if b.ndim == 3 else jnp.broadcast_to(b, (T,) + b.shape)
                for b in blocks
            ]
            return jnp.concatenate(blocks, axis=1)
        return jnp.concatenate(blocks, axis=0)

    def var_correction(self, kernel):
        """[p] or [T, p] conditional-variance correction per head row, or
        None if every head reads the state exactly (on-site observations).

        Off-site spatial heads observe f(s) whose conditional on the state
        f(Z) leaves residual variance ρ(s) = k_t(0)(k_ss − k_sZ K_ZZ^{-1}
        k_Zs); adding ρ to the observation noise gives the exact sparse
        (DTC-style) marginal — the reference applies the same correction in
        its spatial conditional (`computation/spatial_conditionals.py:30`,
        `sparsity/sparsity.py:65` SpatialSparsity).
        """
        from ..ops.matrix import highest_precision

        parts = []
        any_corr = False
        tv = any(
            getattr(h, "points", None) is not None
            and getattr(h, "points").ndim == 3
            for h in self.heads
        )
        for h in self.heads:
            if hasattr(h, "var_correction") and getattr(h, "correction", True):
                c = highest_precision(h.var_correction)(kernel)
                any_corr = True
            elif hasattr(h, "rows"):
                pts = getattr(h, "points", None)
                if pts is None:
                    # point-free row heads (e.g. MixedValueHead) read the
                    # state exactly: zero correction, one per row
                    c = jnp.zeros((h.rows(kernel).shape[-2],))
                elif pts.ndim == 2:
                    c = jnp.zeros((pts.shape[-2],))
                else:
                    c = jnp.zeros(pts.shape[:2])
            else:
                c = jnp.zeros((1,))
            parts.append(c)
        if not any_corr:
            return None
        if tv or any(p.ndim == 2 for p in parts):
            T = next(p.shape[0] for p in parts if p.ndim == 2)
            parts = [
                p if p.ndim == 2 else jnp.broadcast_to(p, (T,) + p.shape)
                for p in parts
            ]
            return jnp.concatenate(parts, axis=1)
        return jnp.concatenate(parts, axis=0)

    @property
    def n_heads(self) -> int:
        return len(self.heads)


# ---------------------------------------------------------------------------
# Spatio-temporal heads: spatial functionals x temporal derivatives.
# ---------------------------------------------------------------------------


def s_identity(k, s, z):
    return k(s, z)


def s_grad(i: int):
    """Row of ∂k_s/∂s_i in the first argument (curl-free / advection terms).

    Tagged with `.kind` so kernels exposing closed-form derivative
    cross-covariances (`K_op`, e.g. RBF) bypass the autodiff path."""
    import jax

    def op(k, s, z):
        return jax.grad(lambda ss: k(ss, z))(s)[i]

    op.kind = ("grad", i)
    return op


def s_grad2(i: int):
    """Row of ∂²k_s/∂s_i² in the first argument (pure second spatial
    derivatives — the reference's SecondOrder diff-op family,
    `kernels/diff_op.py` SecondOrderDerivativeKernel per-dim blocks)."""
    import jax

    def op(k, s, z):
        return jax.grad(
            lambda ss: jax.grad(lambda s2: k(s2, z))(ss)[i]
        )(s)[i]

    op.kind = ("grad2", i)
    return op


def s_laplacian(k, s, z):
    """Σ_i ∂²k_s/∂s_i² in the first argument (diffusion terms).

    The autodiff-of-kernel construction is the reference's derivative-kernel
    idea (`kernels/diff_op.py:12`), applied only to the k(s*, Z) cross rows.
    Kernels with closed forms (`K_op`) skip the nested hessian (see `.kind`).
    """
    import jax

    return jnp.trace(jax.hessian(lambda ss: k(ss, z))(s))


s_laplacian.kind = "laplacian"


@module
class SpatialHead(Head):
    """Observe (L_s ∂_t^order f)(s_k, t) for spatial points `points`.

    row block = w ⊗ t_row with w = (L_s k_s)(s, Z) Kzz^{-1} (the Kronecker
    spatial conditional) and t_row the temporal derivative selector. Data on
    the grid uses points == Z (w == I numerically).

    `correction=True` (SpatialSparsity: data sites ≠ inducing sites Z, ref
    `sparsity/sparsity.py:65`) adds the conditional-variance residual
    ρ(s) = Var(∂_t^o f)(k_ss − k_sZ K_ZZ^{-1} k_Zs) to the observation noise,
    making the filter's marginal the exact sparse-GP (DTC) likelihood.

    `coeff` scales the whole block (fixed physics mixings, e.g. the −1 of a
    curl-free field component H_i = −∂_i φ, ref `zoo/phi_ml.py:38-55`
    W_curl_free); a Param coeff is trainable."""

    points: jnp.ndarray  # [N_h, ds]
    t_order: int = static(default=0)
    s_op: object = static(default=None)
    correction: bool = static(default=False)
    coeff: object = 1.0  # scalar | Param

    def _coeff(self):
        return self.coeff.value if isinstance(self.coeff, Param) else self.coeff

    def rows(self, kernel) -> jnp.ndarray:
        w = kernel.spatial_weights(self.points, self.s_op)  # [N_h, Ns]
        t_row = derivative_row(kernel.k_time, self.t_order)  # [d]
        N_h, Ns = w.shape
        return self._coeff() * jnp.einsum("ns,d->nsd", w, t_row).reshape(
            N_h, Ns * t_row.shape[0]
        )

    def var_correction(self, kernel):
        if not self.correction:
            return jnp.zeros((self.points.shape[0],))
        # residual of the OPERATOR read (derivative heads scale ~ σ²/ℓ²,
        # not the value kernel's σ², and ∂_t^o reads scale by the o-th
        # derivative's stationary variance) — same s_op/t_order as rows()
        c = self._coeff()
        return (c * c) * kernel.conditional_var_correction(
            self.points, self.s_op, self.t_order
        )


@module
class ScatteredSpatialHead(Head):
    """Observe f at per-TIME-STEP spatial points (moving sensors / ragged
    time groups, ref `data/data.py:727` TemporallyGroupedData).

    points [T, Ng, ds] — e.g. `TemporallyGroupedData.X_st`. Produces a
    time-varying observation matrix H [T, Ng, Ns·d] through the spatial
    conditional at each step's points; NaN rows of Y mask the filler points.
    The conditional-variance correction is on by default (scattered points
    rarely coincide with Z)."""

    points: jnp.ndarray  # [T, Ng, ds]
    t_order: int = static(default=0)
    s_op: object = static(default=None)
    correction: bool = static(default=True)

    def rows(self, kernel) -> jnp.ndarray:
        import jax

        w = jax.vmap(lambda p: kernel.spatial_weights(p, self.s_op))(
            self.points
        )  # [T, Ng, Ns] — Kzz chol is unbatched, hoisted out of the vmap
        t_row = derivative_row(kernel.k_time, self.t_order)  # [d]
        T, Ng, Ns = w.shape
        return jnp.einsum("tns,d->tnsd", w, t_row).reshape(
            T, Ng, Ns * t_row.shape[0]
        )

    def var_correction(self, kernel):
        import jax

        if not self.correction:
            return jnp.zeros(self.points.shape[:2])
        return jax.vmap(
            lambda p: kernel.conditional_var_correction(
                p, self.s_op, self.t_order
            )
        )(self.points)  # [T, Ng]


@module
class StackedHead(Head):
    """One block of observation rows over a `StackedMarkov` state.

    `parts` has one entry per stacked latent: ``None`` (zero block), a head,
    or ``(coeff, head)`` — the coefficient scales the sub-head's rows (fixed
    physics mixings; a Param coeff is trainable). Non-None sub-heads must
    produce the same number of rows; blocks concatenate horizontally over the
    per-part state slices. This is the state-space form of the reference's
    fixed-W LMC over independent latents (`transforms/multi_output.py` LMC +
    `zoo/phi_ml.py:146,267` helmholtz/helmholtz_3D): e.g. the 2-D Helmholtz
    flow over latents (φ potential, ψ stream),

        u row: [ (∂x φ)(s) | +(∂y ψ)(s) ]
        v row: [ (∂y φ)(s) | −(∂x ψ)(s) ].
    """

    parts: list = field(default_factory=list)

    @staticmethod
    def _split(entry):
        if isinstance(entry, tuple):
            c, h = entry
            return (c.value if isinstance(c, Param) else c), h
        return 1.0, entry

    def rows(self, kernel) -> jnp.ndarray:
        blocks, n_rows, dtype = [], None, None
        for entry, part in zip(self.parts, kernel.parts):
            if entry is None:
                blocks.append(None)
                continue
            c, h = self._split(entry)
            b = h.rows(part) if hasattr(h, "rows") else h.row(part)[None, :]
            if b.ndim != 2:
                raise ValueError(
                    "StackedHead sub-heads must produce static [N, d_part] "
                    f"rows; got shape {b.shape} (time-varying sub-heads are "
                    "not supported)"
                )
            blocks.append(c * b)
            n_rows, dtype = b.shape[0], b.dtype
        if n_rows is None:
            raise ValueError("StackedHead needs at least one non-None part")
        out = []
        for entry_block, part in zip(blocks, kernel.parts):
            if entry_block is None:
                out.append(jnp.zeros((n_rows, part.state_dim), dtype))
            else:
                out.append(entry_block)
        return jnp.concatenate(out, axis=-1)

    def var_correction(self, kernel) -> jnp.ndarray:
        """Σ_parts c² ρ_part(s): conditional residual variances of
        independent latents add (each scaled by its mixing coefficient²)."""
        out = None
        for entry, part in zip(self.parts, kernel.parts):
            if entry is None:
                continue
            c, h = self._split(entry)
            if hasattr(h, "var_correction") and getattr(h, "correction", True):
                v = (c * c) * h.var_correction(part)
                out = v if out is None else out + v
        if out is None:
            out = jnp.zeros((self.points.shape[0],))
        return out

    @property
    def correction(self) -> bool:
        return any(
            getattr(self._split(e)[1], "correction", False)
            for e in self.parts
            if e is not None
        )

    @property
    def points(self):
        """Row-count source (first non-None sub-head's points) for
        StateObservation's zero-correction bookkeeping."""
        for e in self.parts:
            if e is not None:
                return self._split(e)[1].points
        raise AttributeError("StackedHead with no parts has no points")


@module
class MixedValueHead(Head):
    """State-space LMC rows: observe g = W f over a `StackedMarkov` state.

    The reference applies LMC in the prior DAG over SDE latents
    (`transforms/multi_output.py:206` used by the sde model zoo); here the
    mixing is P observation rows over the stacked latent states — same
    marginal (Cov(g_p, g_q) = Σ_l W_pl W_ql k_l), O(T) through the filters.
    `W` duck-types `.value` [P, L]: a Param, a plain array, or the
    `kernels.multi_output` mixing objects (UnitLowerMixing /
    CorrelationMixing), so every LMC parameterisation variant drops in.
    """

    W: object = None  # Param | ndarray | mixing object with .value [P, L]
    t_order: int = static(default=0)

    def rows(self, kernel) -> jnp.ndarray:
        W = self.W.value if hasattr(self.W, "value") else jnp.asarray(self.W)
        parts = kernel.parts
        if W.shape[1] != len(parts):
            raise ValueError(
                f"mixing W has {W.shape[1]} latent columns but the stacked "
                f"kernel has {len(parts)} parts"
            )
        blocks = [
            W[:, l:l + 1] * derivative_row(part, self.t_order)[None, :]
            for l, part in enumerate(parts)
        ]
        return jnp.concatenate(blocks, axis=-1)


@module
class OperatorTerm:
    """One c · (L_s ∂_t^order f) term; coeff may be a trainable Param."""

    coeff: object  # Param or plain scalar (data leaf)
    t_order: int = static(default=0)
    s_op: object = static(default=None)  # spatial operator (static callable)


@module
class STOperatorHead(Head):
    """PDE residual rows: sum_j c_j (L_s^j ∂_t^{o_j} f)(s_k, t) = 0.

    E.g. 2D advection-diffusion ∂t f - a Δf + v·∇f = 0:
      terms = [OperatorTerm(1.0, t_order=1),
               OperatorTerm(-a, s_op=s_laplacian),
               OperatorTerm(vx, s_op=s_grad(0)),
               OperatorTerm(vy, s_op=s_grad(1))].
    """

    points: jnp.ndarray  # [N_c, ds] collocation points
    terms: list = field(default_factory=list)

    def rows(self, kernel) -> jnp.ndarray:
        out = None
        for term in self.terms:
            c = term.coeff
            cv = c.value if hasattr(c, "value") else c
            w = kernel.spatial_weights(self.points, term.s_op)  # [N_c, Ns]
            t_row = derivative_row(kernel.k_time, term.t_order)  # [d]
            block = jnp.einsum("ns,d->nsd", w, t_row).reshape(
                w.shape[0], w.shape[1] * t_row.shape[0]
            )
            out = cv * block if out is None else out + cv * block
        return out
