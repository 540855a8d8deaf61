"""Batch derivative-operator kernels via nested autodiff.

TPU-native counterpart of the reference's `kernels/diff_op.py:12-1258`
(FirstOrder/SecondOrder derivative kernels in 1/2/3-D, closed-form RBF
variants) — collapsed into ONE implementation: outputs are linear-operator
views L_a f of a scalar GP, and

    Cov((L_a f)(x), (L_b f)(x')) = L_a^x L_b^{x'} k(x, x')

is built by nested `jax.grad` over the base kernel's scalar form, vmapped
into Gram blocks (XLA fuses the derivative towers; no hand-derived
closed forms needed, any base kernel works).

An optional mixing matrix W [P_out, P_ops] left-multiplies the operator
outputs — fixed physics mixings (curl-free field = -∇φ, Helmholtz
decompositions; ref `zoo/phi_ml.py:7,146`) and LMC-style learned mixings use
the same path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.params import Param
from ..utils.struct import field, module, static
from .base import Kernel, _as_2d, autodiff_deriv_fn

__all__ = ["DerivativeKernel", "grad_ops", "second_order_ops"]


def grad_ops(ds: int, include_value: bool = False):
    """Ops for (f,) gradient components: [(0,), (1,), ...]."""
    ops = [()] if include_value else []
    return tuple(ops) + tuple((i,) for i in range(ds))


def second_order_ops(ds: int):
    """(f, ∂_i f ..., ∂_ii f ...) — the reference's SecondOrder family."""
    ops = [()]
    ops += [(i,) for i in range(ds)]
    ops += [(i, i) for i in range(ds)]
    return tuple(ops)


def _apply_ops(kernel, a: tuple, b: tuple):
    """∂^a_{x1} ∂^b_{x2} k: the kernel's closed form when it has one
    (`k_deriv_fn` — exact at coincident points for |τ| kernels like Matérn,
    where the autodiff tower is wrong), else nested autodiff."""
    return kernel.k_deriv_fn(a, b) or autodiff_deriv_fn(kernel.k_scalar, a, b)


@module
class DerivativeKernel(Kernel):
    """Multi-output kernel over (L_a f)_a for derivative operators `ops`.

    ops: tuple of multi-indices over input dims; () = identity.
    W: optional [P, len(ops)] mixing (fixed array or Param) — outputs become
       g = W (L f).
    Output Grams are DATA-MAJOR: K[(i,p),(j,q)] at row i*P+p.
    """

    base: object
    ops: tuple = static(default=((),))
    W: object = None  # None | ndarray | Param

    @property
    def n_outputs(self) -> int:
        if self.W is None:
            return len(self.ops)
        W = self.W.value if isinstance(self.W, Param) else self.W
        return W.shape[0]

    def _mix(self):
        if self.W is None:
            return None
        return self.W.value if isinstance(self.W, Param) else self.W

    def K_blocks(self, X1, X2) -> jnp.ndarray:
        """[P_ops, P_ops, N, M] operator-covariance blocks."""
        X1, X2 = _as_2d(X1), _as_2d(X2)
        rows = []
        for a in self.ops:
            cols = []
            for b in self.ops:
                fab = _apply_ops(self.base, a, b)
                Kab = jax.vmap(lambda x: jax.vmap(lambda y: fab(x, y))(X2))(X1)
                cols.append(Kab)
            rows.append(jnp.stack(cols))
        return jnp.stack(rows)  # [P, Q, N, M]

    def K(self, X1, X2) -> jnp.ndarray:
        """Data-major multi-output Gram [N*P, M*P]."""
        B = self.K_blocks(X1, X2)
        W = self._mix()
        if W is not None:
            B = jnp.einsum("pa,abnm,qb->pqnm", W, B, W)
        P = B.shape[0]
        N, M = B.shape[2], B.shape[3]
        return jnp.transpose(B, (2, 0, 3, 1)).reshape(N * P, M * P)

    def K_diag(self, X) -> jnp.ndarray:
        X = _as_2d(X)
        cols = []
        for a in self.ops:
            row = []
            for b in self.ops:
                fab = _apply_ops(self.base, a, b)
                row.append(jax.vmap(lambda x: fab(x, x))(X))
            cols.append(jnp.stack(row))
        B = jnp.stack(cols)  # [P, Q, N]
        W = self._mix()
        if W is not None:
            B = jnp.einsum("pa,abn,pb->pn", W, B, W)  # diag of W B W^T
            return jnp.transpose(B).reshape(-1)  # [N*P] data-major
        diag = jnp.einsum("ppn->pn", B)
        return jnp.transpose(diag).reshape(-1)
