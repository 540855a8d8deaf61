"""Finite-difference fuzz of the derivative-covariance algebra.

Every other gate of `k_deriv_fn`/`autodiff_deriv_fn` shares JAX machinery
(autodiff or the SS filter). Central finite differences of `k_scalar` in
fp64 are a fully independent oracle for ∂^a_{x1}∂^b_{x2} k — this fuzzes
random kernel compositions (RBF/Matérn via OnDims, sums, separable
products), random multi-indices up to 2nd order per argument, at random
off-coincident points (FD cannot see the |τ| kink, which the SS gates in
test_deriv_zoo.py pin instead).
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.kernels import RBF, Matern52, Matern72, OnDims
from physs_gp_tpu.kernels.derivative import _apply_ops
from physs_gp_tpu.utils.params import positive_param


def _fd_weights(order):
    # central stencils, error O(h^4)
    if order == 0:
        return {0: 1.0}
    if order == 1:
        return {-2: 1 / 12, -1: -8 / 12, 1: 8 / 12, 2: -1 / 12}
    if order == 2:
        return {-2: -1 / 12, -1: 16 / 12, 0: -30 / 12, 1: 16 / 12, 2: -1 / 12}
    raise ValueError(order)


def _fd_deriv(k, x1, x2, a, b, h=2e-3):
    """∂^a_{x1}∂^b_{x2} k by nested central differences (orders ≤ 2/dim)."""
    from collections import Counter

    o1, o2 = Counter(a), Counter(b)

    def shifted(x, dim_offsets, base):
        x = np.array(base, dtype=float)
        for d, s in dim_offsets:
            x[d] += s * h
        return x

    val = 0.0
    dims1 = sorted(o1)
    dims2 = sorted(o2)
    grids1 = [list(_fd_weights(o1[d]).items()) for d in dims1]
    grids2 = [list(_fd_weights(o2[d]).items()) for d in dims2]
    for c1 in itertools.product(*grids1):
        for c2 in itertools.product(*grids2):
            w = np.prod([wc for _, wc in c1] + [wc for _, wc in c2] + [1.0])
            p1 = shifted(None, [(d, s) for d, (s, _) in zip(dims1, c1)], x1)
            p2 = shifted(None, [(d, s) for d, (s, _) in zip(dims2, c2)], x2)
            val += w * float(k.k_scalar(jnp.asarray(p1), jnp.asarray(p2)))
    return val / h ** (len(a) + len(b))


def _kernels(D, rng):
    ks = []
    ks.append(RBF(lengthscales=positive_param(jnp.asarray(rng.uniform(0.7, 1.4, D))),
                  variance=positive_param(1.3)))
    if D >= 2:
        ks.append(
            OnDims(base=Matern52(lengthscale=0.9, variance=1.2), dims=(0,))
            * OnDims(
                base=RBF(lengthscales=positive_param(
                    jnp.asarray(rng.uniform(0.7, 1.4, D - 1)))),
                dims=tuple(range(1, D)),
            )
        )
        ks.append(
            OnDims(base=Matern72(lengthscale=1.1, variance=0.8), dims=(0,))
            * OnDims(
                base=RBF(lengthscales=positive_param(
                    jnp.asarray(rng.uniform(0.7, 1.4, D - 1)))),
                dims=tuple(range(1, D)),
            )
            + RBF(lengthscales=positive_param(jnp.asarray(rng.uniform(1.0, 2.0, D))),
                  variance=positive_param(0.6))
        )
    return ks


@pytest.mark.parametrize("D", [1, 2, 3])
def test_deriv_towers_match_finite_differences(D):
    rng = np.random.default_rng(D)
    multi = [(), (0,), (0, 0)]
    if D >= 2:
        multi += [(1,), (1, 1), (0, 1)]
    for k in _kernels(D, rng):
        # well-separated points: FD stencils must not cross the tau=0 kink
        x1 = rng.uniform(0.5, 1.0, D)
        x2 = -rng.uniform(0.5, 1.0, D)
        for a in multi:
            for b in multi:
                if len(a) + len(b) == 0:
                    continue
                got = float(_apply_ops(k, a, b)(jnp.asarray(x1), jnp.asarray(x2)))
                want = _fd_deriv(k, x1, x2, a, b)
                # tolerance bounded by FD truncation on 4th-order mixed
                # derivatives of Matérn factors (their 5th/6th derivatives
                # are large); algebra errors (sign/factor/routing) are O(1)
                np.testing.assert_allclose(
                    got, want, rtol=2e-3, atol=2e-5,
                    err_msg=f"{type(k).__name__} D={D} a={a} b={b}",
                )


def test_deriv_gram_psd():
    """Random derivative-op Grams are PSD (a wrong cross-covariance sign
    or asymmetric tower breaks PSD immediately)."""
    from physs_gp_tpu.kernels import DerivativeKernel

    rng = np.random.default_rng(7)
    for D, ops in [
        (1, ((), (0,), (0, 0))),
        (2, ((), (0,), (1,), (1, 1))),
        (3, ((), (1,), (2,), (1, 2))),
    ]:
        k = RBF(lengthscales=positive_param(jnp.asarray(rng.uniform(0.7, 1.3, D))),
                variance=positive_param(1.1))
        kd = DerivativeKernel(base=k, ops=ops)
        X = rng.uniform(-1, 1, (6, D))
        K = np.asarray(kd.K(X, X))
        np.testing.assert_allclose(K, K.T, atol=1e-10)
        w = np.linalg.eigvalsh(K)
        assert w.min() > -1e-8, (D, ops, w.min())
