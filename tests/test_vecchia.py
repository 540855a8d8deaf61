"""Vecchia GP gates: exactness at m = N-1, accuracy of small-m conditioning,
prediction vs the dense GP, missing data, and hyperparameter gradients.

Closes the reference's nearest-neighbour surface
(`/root/reference/src/lib/stgp/transforms/nearest_neighbours.py:34`,
`data/nearest_neighbours_data.py:7`) with a working model — the upstream
implementation is an unfinished debug path (``breakpoint()`` at
`transforms/nearest_neighbours.py:60`).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.data.neighbours import (
    maximin_ordering,
    nearest_neighbour_sets,
)
from physs_gp_tpu.kernels.rbf import RBF
from physs_gp_tpu.models import BatchGP, VecchiaGP


def _data(N=80, D=2, seed=0, ls=0.6, noise=0.05):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0, 3, (N, D))
    K = np.exp(
        -0.5
        * np.sum((X[:, None, :] - X[None, :, :]) ** 2, -1)
        / ls**2
    )
    f = np.linalg.cholesky(K + 1e-10 * np.eye(N)) @ rng.standard_normal(N)
    y = f + np.sqrt(noise) * rng.standard_normal(N)
    return X, y[:, None]


def _models(X, y, m, ordering="maximin", ls=0.6, var=1.0, noise=0.05):
    from physs_gp_tpu.likelihoods.gaussian import Gaussian
    from physs_gp_tpu.utils.params import positive_param

    kern = RBF(
        lengthscales=positive_param(np.full(X.shape[1], ls)),
        variance=positive_param(var),
    )
    lik = Gaussian(variance=positive_param(noise))
    vgp = VecchiaGP.init(X, y, kern, lik, m=m, ordering=ordering)
    bgp = BatchGP(
        X=jnp.asarray(X), Y=jnp.asarray(y), kernel=kern, likelihood=lik
    )
    return vgp, bgp


def test_neighbour_sets_shapes_and_causality():
    X, _ = _data(N=60)
    order, nbrs, mask = nearest_neighbour_sets(X, m=8)
    assert sorted(order.tolist()) == list(range(60))
    assert nbrs.shape == (60, 8) and mask.shape == (60, 8)
    # strictly preceding conditioning sets; padding only where i < m
    for i in range(60):
        k = int(mask[i].sum())
        assert k == min(i, 8)
        assert np.all(nbrs[i, :k] < i)
    # maximin ordering: a permutation whose early points spread out
    o = maximin_ordering(X)
    assert sorted(o.tolist()) == list(range(60))


def test_vecchia_full_conditioning_is_exact():
    # m = N-1: the telescoping product is the exact joint density
    X, y = _data(N=40)
    vgp, bgp = _models(X, y, m=39)
    lv = jax.jit(lambda m: m.log_marginal_likelihood())(vgp)
    lb = jax.jit(lambda m: m.log_marginal_likelihood())(bgp)
    assert abs(float(lv) - float(lb)) < 1e-8 * abs(float(lb))


def test_vecchia_small_m_converges_to_exact():
    X, y = _data(N=200, seed=1)
    lml = jax.jit(lambda m: m.log_marginal_likelihood())
    lb = float(lml(_models(X, y, m=5)[1]))
    errs = [
        abs(float(lml(_models(X, y, m=m)[0])) - lb) for m in (5, 12, 30)
    ]
    # monotone convergence in m, and ~1% of the exact lml by m=30
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 0.02 * abs(lb)


def test_vecchia_prediction_matches_dense():
    X, y = _data(N=150, seed=2)
    Xs = np.random.default_rng(5).uniform(0.2, 2.8, (40, 2))
    vgp, bgp = _models(X, y, m=20)
    fv = jax.jit(lambda m, xs: m.predict_f(xs))(vgp, jnp.asarray(Xs))
    fb = jax.jit(lambda m, xs: m.predict_f(xs))(bgp, jnp.asarray(Xs))
    assert fv.mean.shape == (40, 1) and fv.var.shape == (40, 1)
    # m=20 of N=150 conditioning: close but approximate
    assert float(jnp.max(jnp.abs(fv.mean - fb.mean))) < 0.25
    assert float(jnp.max(jnp.abs(fv.var - fb.var))) < 0.03
    assert float(jnp.min(fv.var)) > 0.0
    # conditioning on ALL training points reproduces the dense posterior
    ff = jax.jit(lambda m, xs: m.predict_f(xs, m_predict=150))(
        vgp, jnp.asarray(Xs)
    )
    assert float(jnp.max(jnp.abs(ff.mean - fb.mean))) < 1e-7
    assert float(jnp.max(jnp.abs(ff.var - fb.var))) < 1e-7
    # predictive density utilities run and are finite
    nl = jax.jit(lambda m, xs, ys: m.nlpd(xs, ys))(
        vgp, jnp.asarray(Xs), fb.mean
    )
    assert np.isfinite(float(nl))


def test_vecchia_missing_data():
    X, y = _data(N=60, seed=3)
    y_nan = y.copy()
    y_nan[::5] = np.nan
    # exact-conditioning Vecchia on NaN-masked data == BatchGP masked lml
    vgp, bgp = _models(X, y_nan, m=59)
    lv = jax.jit(lambda m: m.log_marginal_likelihood())(vgp)
    lb = jax.jit(lambda m: m.log_marginal_likelihood())(bgp)
    assert abs(float(lv) - float(lb)) < 1e-8 * abs(float(lb))
    # prediction ignores missing rows and stays finite
    f = jax.jit(lambda m, xs: m.predict_f(xs))(vgp, jnp.asarray(X[:7]))
    assert bool(jnp.all(jnp.isfinite(f.mean))) and float(jnp.min(f.var)) >= 0


def test_vecchia_hyperparameter_gradients():
    X, y = _data(N=100, seed=4)
    vgp, _ = _models(X, y, m=10)

    def obj(m):
        return m.get_objective()

    g = jax.jit(jax.grad(obj))(vgp)
    leaves = [
        g.kernel.lengthscales.raw,
        g.kernel.variance.raw,
        g.likelihood.variance.raw,
    ]
    for leaf in leaves:
        assert bool(jnp.all(jnp.isfinite(leaf)))
    assert any(float(jnp.max(jnp.abs(l))) > 1e-6 for l in leaves)
