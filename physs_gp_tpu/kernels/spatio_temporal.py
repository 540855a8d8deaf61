"""Separable spatio-temporal Markov kernel: k((t,s), (t',s')) = k_t(t,t') k_s(s,s').

TPU-native counterpart of the reference's `SpatioTemporalSeperableKernel`
(`kernels/kernel.py:213-265`, SS rep in `kernels/ss_utils.py:42`): the
state-space representation over a fixed set of spatial sites Z [Ns, ds] is

    x(t) = (temporal state at each z_j)  in R^{Ns * d_t}
    A_st(dt) = I_Ns ⊗ A_t(dt)      (transition)
    P_inf    = K_s(Z,Z) ⊗ P_inf_t  (stationary covariance)
    Q(dt)    = K_s(Z,Z) ⊗ Q_t(dt)  (discretised noise — exact for separable)
    H        = I_Ns ⊗ H_t          (observe f on the grid)

State ordering is site-major: x = [site_0 temporal block, site_1 block, ...],
matching `kron(spatial, temporal)` index conventions everywhere.

Scaling note: A/Q are materialised as [T, Ns*d_t, Ns*d_t] for the generic
filters (as the reference does). The Kronecker structure of the *leaf*
elements is exploited where it survives (element construction einsums);
after one associative combine the structure is gone, which is inherent to
the parallel-scan algorithm, not the implementation.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.lgssm import LGSSM
from ..ops.matrix import default_jitter, kron, kron_lift, safe_cholesky, symmetrize
from ..utils.struct import field, module, static
from .base import _as_2d, Kernel
from .markov import noise_matrix, to_ss, transition_matrix

__all__ = ["SpatioTemporalKernel"]


@module
class SpatioTemporalKernel(Kernel):
    """k_t (Markov) x k_s over spatial sites Z.

    Z may be a plain array (fixed sites — gridded data) or a `Param`
    (TRAINABLE inducing locations, the reference's SpatialSparsity
    `sparsity/sparsity.py:65`: optimisers then move Z jointly with the
    hyperparameters while data stays at its own fixed locations via
    `SpatialHead(points=X_data, correction=True)`).
    """

    k_time: object
    k_space: object
    Z: object  # [Ns, ds] spatial sites carrying the state (array or Param)

    @property
    def sites(self) -> jnp.ndarray:
        return self.Z.value if hasattr(self.Z, "value") else self.Z

    # ---- dense (batch) kernel interface ----
    def k_scalar(self, x1, x2):
        """x = [t, s...]: separable product (for batch-GP cross-checks)."""
        t1, s1 = x1[..., :1], x1[..., 1:]
        t2, s2 = x2[..., :1], x2[..., 1:]
        return self.k_time.k_scalar(t1, t2) * self.k_space.k_scalar(s1, s2)

    # ---- state-space interface ----
    @property
    def n_sites(self) -> int:
        return self.sites.shape[0]

    @property
    def temporal_state_dim(self) -> int:
        return to_ss(self.k_time).state_dim

    @property
    def state_dim(self) -> int:
        return self.n_sites * self.temporal_state_dim

    def Kzz(self) -> jnp.ndarray:
        """Spatial gram with RELATIVE jitter: dense grids under smooth RBF
        kernels are near-singular, and the lifted P0 = Kzz ⊗ Pinf_t inherits
        the conditioning — in fp32 this NaNs the filter without it.

        PHYSS_KZZ_JITTER (trace-time env knob) overrides the relative eps
        (default 100·default_jitter(dtype), i.e. 1e-4 in fp32 / 1e-10 in
        fp64). This regularisation is a PRIOR change, not roundoff: on the
        Allen-Cahn workload the fp32 default accounts for 0.21 of the 0.29
        posterior-mean deviation from the fp64 run (measured by running the
        fp64 arm with PHYSS_KZZ_JITTER=1e-4 — see experiments/ac.py
        --compare, `precision_ladder` in results/ac_compare.json). Training
        at fp32 needs the full default; inference-only passes tolerate down
        to 1e-6."""
        import os

        K = self.k_space.K(self.sites, self.sites)
        scale = jnp.mean(jnp.diagonal(K))
        ov = os.environ.get("PHYSS_KZZ_JITTER")
        eps = float(ov) if ov is not None else 100.0 * default_jitter(K.dtype)
        return K + eps * scale * jnp.eye(K.shape[0], dtype=K.dtype)

    def to_lgssm(self, t: jnp.ndarray) -> LGSSM:
        """Kron-lifted discretised system over time points t [T]."""
        t = jnp.ravel(t)
        ss_t = to_ss(self.k_time)
        dt = jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.diff(t)])
        A_t = transition_matrix(self.k_time, dt)  # [T, d, d]
        Q_t = noise_matrix(self.k_time, dt)  # [T, d, d]
        Ns = self.n_sites
        eye_s = jnp.eye(Ns, dtype=A_t.dtype)
        Ks = self.Kzz()
        # tile-based lift: the broadcast kron's [T, Ns, d, Ns, d]
        # intermediate OOMs TPU compilation at T ~ 100k (see
        # ops.matrix.kron_lift)
        A = kron_lift(eye_s, A_t)  # [T, Ns*d, Ns*d]
        Q = kron_lift(Ks, Q_t)
        Pinf = symmetrize(kron(Ks, ss_t.Pinf))
        H = kron(eye_s, ss_t.H)  # [Ns, Ns*d]
        D = Ns * ss_t.state_dim
        return LGSSM(A=A, Q=Q, H=H, m0=jnp.zeros(D, A.dtype), P0=Pinf)

    def spatial_weights(self, s_new: jnp.ndarray, s_op=None) -> jnp.ndarray:
        """Conditional weights w [N*, Ns]: (L_s f)(s*) ≈ w @ f(Z).

        w = (L_s k_s)(s*, Z) @ K_zz^{-1} — the Kronecker spatial conditional
        (ref `computation/spatial_conditionals.py:30`); `s_op` applies a
        linear spatial operator (gradient/Laplacian rows for PDE residuals,
        ref `kernels/diff_op.py` derivative cross-covariances) to
        k_s(., z) in its first argument; None = identity.
        """
        Ksz = self._op_cross(_as_2d(s_new), s_op)
        L = safe_cholesky(self.Kzz())
        import jax.scipy.linalg as jsl

        return jsl.cho_solve((L, True), Ksz.T).T  # [N*, Ns]

    def _op_cross(self, s_new: jnp.ndarray, s_op=None) -> jnp.ndarray:
        """(L_s k_s)(s*, Z) [N*, Ns] — operator applied in the FIRST arg."""
        import jax

        if s_op is None:
            return self.k_space.K(s_new, self.sites)  # [N*, Ns]
        if hasattr(s_op, "kind") and hasattr(self.k_space, "K_op"):
            # closed-form derivative cross-covariance (RBF): one batched
            # expression — vastly fewer XLA ops than the nested-autodiff
            # fallback, and bf16-safe (no tiny-op chains)
            return self.k_space.K_op(s_new, self.sites, s_op.kind)
        return jax.vmap(
            lambda s: jax.vmap(lambda z: s_op(self.k_space.k_scalar, s, z))(
                self.sites
            )
        )(s_new)

    def conditional_var_correction(self, s_new: jnp.ndarray, s_op=None,
                                   t_order: int = 0) -> jnp.ndarray:
        """Var(∂_t^o f) * ((L L' k)(s, s) - (L k_sz) Kzz^-1 (L k_zs)) —
        residual prior variance of the operator read (L_s ∂_t^o f)(s) given
        f(Z), at off-grid spatial points (time-independent for separable
        kernels). `s_op` None = value read; otherwise the SAME operator the
        head's rows use — e.g. a gradient head's residual scales as σ²/ℓ²,
        NOT the value kernel's σ²-scale residual. Likewise `t_order` must be
        the head's temporal-derivative order: the o-th time derivative's
        stationary variance is r Pinf rᵀ (r = `derivative_row`), e.g. λ²σ²
        for Matérn-3/2's f′ — NOT k_t(0).
        """
        import jax

        s_new = _as_2d(s_new)
        w = self.spatial_weights(s_new, s_op)
        Ksz = self._op_cross(s_new, s_op)
        if s_op is None:
            kss = self.k_space.K_diag(s_new)
        else:
            # (L ⊗ L' k)(s, s): apply the operator in BOTH arguments — on the
            # swapped kernel, L on the first arg of k(z, s) is L' on k(s, z)
            k = self.k_space.k_scalar

            def op_both(s):
                g = lambda a, b: s_op(k, b, a)  # (L' k)(a=z, b=s) swapped
                return s_op(g, s, s)

            kss = jax.vmap(op_both)(s_new)
        resid = jnp.maximum(kss - jnp.sum(w * Ksz, axis=-1), 0.0)
        if t_order == 0:
            kt0 = self.k_time.K_diag(jnp.zeros((1, 1), s_new.dtype))[0]
        else:
            # stationary variance of the o-th time derivative from the SS
            # form (lazy import: transforms imports kernels at module level)
            from ..transforms.operators import derivative_row

            r = derivative_row(self.k_time, t_order)
            kt0 = r @ to_ss(self.k_time).Pinf @ r
        return kt0 * resid
