"""Power / LossLikelihood / response-curve gates."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.kernels import Matern32
from physs_gp_tpu.likelihoods import Gaussian, LossLikelihood, Power
from physs_gp_tpu.metrics import response_curve
from physs_gp_tpu.models import CVIGP, BatchGP
from physs_gp_tpu.utils.params import positive_param


@pytest.mark.slow
def test_power_likelihood_cvi():
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 5, 50))
    y = np.sin(2 * t) ** 2 + 0.05 * rng.normal(size=50)
    m = CVIGP.init(jnp.asarray(t), jnp.asarray(y)[:, None],
                   Matern32(lengthscale=0.8), Power(power=2.0))
    e0 = float(m.elbo())
    for _ in range(40):
        m = m.natural_gradient_update(0.5)
    assert float(m.elbo()) > e0


@pytest.mark.slow
def test_loss_likelihood_robust_regression():
    """L1 pseudo-likelihood: posterior tracks the data, robust to outliers."""
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 5, 60))
    y = np.sin(2 * t) + 0.05 * rng.normal(size=60)
    y[::15] += 3.0  # gross outliers
    m = CVIGP.init(jnp.asarray(t), jnp.asarray(y)[:, None],
                   Matern32(lengthscale=0.8),
                   LossLikelihood(loss=lambda yy, ff: jnp.abs(yy - ff) / 0.05))
    for _ in range(30):
        m = m.natural_gradient_update(0.1)
    post = m.posterior()
    clean = np.ones(60, bool)
    clean[::15] = False
    rmse = float(np.sqrt(np.mean(
        (np.asarray(post.mean[clean, 0]) - np.sin(2 * t[clean])) ** 2)))
    assert rmse < 0.15, rmse


def test_response_curve():
    rng = np.random.default_rng(2)
    X = rng.uniform(-1, 1, (40, 2))
    y = np.sin(2 * X[:, 0]) + 0.3 * X[:, 1] + 0.05 * rng.normal(size=40)
    m = BatchGP(X=jnp.asarray(X), Y=jnp.asarray(y)[:, None],
                kernel=Matern32(lengthscale=0.7),
                likelihood=Gaussian(positive_param(0.0025)))
    mean, lo, hi = response_curve(m, np.linspace(-1, 1, 25), feature=0,
                                  X_ref=np.zeros(2))
    assert np.all(np.asarray(lo) < np.asarray(hi))
    corr = np.corrcoef(np.asarray(mean[:, 0]),
                       np.sin(2 * np.linspace(-1, 1, 25)))[0, 1]
    assert corr > 0.95, corr
