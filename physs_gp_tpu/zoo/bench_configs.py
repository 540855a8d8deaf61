"""Benchmark model builders (the driver's north-star workloads).

These live in the package (not in the top-level ``bench.py`` script) so that
``bench.py`` and ``__graft_entry__.py`` can import them without path surgery
and the flagship configuration is a first-class, importable recipe.

- :func:`build_config5` — BASELINE.md "config 5": T-step irregular time series
  with a 2-D advection-diffusion PDE prior over a 4x4 spatial grid
  (state dim 32: 16 sites x Matern-3/2), 16 grid observation heads + 16
  PDE-residual collocation heads, CVI inference. Reference procedure:
  the ST PDE experiments driven through
  ``/root/reference/src/lib/stgp/zoo/spatio_temporal.py`` (model shape) with
  the parallel-scan filter of
  ``/root/reference/src/lib/stgp/computation/filters/parallel_kalman_filter.py:295``.
- :func:`build_temporal` — the round-1 temporal workload: d=2 Matern-3/2
  Poisson CVI series (the reference's headline parallel-scan KF shape).
"""
import numpy as np


def build_config5(T, chunk, parallel=True, dtype=None, sqrt=False):
    import jax.numpy as jnp

    from physs_gp_tpu.kernels import Matern32
    from physs_gp_tpu.kernels.rbf import RBF
    from physs_gp_tpu.kernels.spatio_temporal import SpatioTemporalKernel
    from physs_gp_tpu.likelihoods.gaussian import IndependentGaussian
    from physs_gp_tpu.models import CVIGP
    from physs_gp_tpu.transforms.operators import (
        OperatorTerm,
        STOperatorHead,
        SpatialHead,
        StateObservation,
        s_grad,
        s_laplacian,
    )
    from physs_gp_tpu.utils.params import positive_param

    dtype = dtype or jnp.float32
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 100, T)).astype(np.float32)
    gx = np.linspace(0, 1, 4)
    Z = np.stack(np.meshgrid(gx, gx), -1).reshape(-1, 2).astype(np.float32)
    Ns = Z.shape[0]
    coll = (Z + 0.5 * (gx[1] - gx[0]))[:Ns]
    Nc = coll.shape[0]
    Y = np.concatenate(
        [rng.normal(size=(T, Ns)).astype(np.float32),
         np.zeros((T, Nc), np.float32)], axis=1,
    )
    kern = SpatioTemporalKernel(
        k_time=Matern32(lengthscale=jnp.asarray(5.0, dtype),
                        variance=jnp.asarray(1.0, dtype)),
        k_space=RBF(lengthscales=positive_param(jnp.asarray(0.5, dtype)),
                    variance=positive_param(jnp.asarray(1.0, dtype))),
        Z=jnp.asarray(Z, dtype),
    )
    obs = StateObservation(heads=[
        SpatialHead(points=jnp.asarray(Z, dtype)),
        STOperatorHead(points=jnp.asarray(coll, dtype), terms=[
            OperatorTerm(coeff=1.0, t_order=1),
            OperatorTerm(coeff=-0.1, s_op=s_laplacian),
            OperatorTerm(coeff=0.2, s_op=s_grad(0)),
            OperatorTerm(coeff=0.1, s_op=s_grad(1)),
        ]),
    ])
    lik = IndependentGaussian(
        variances=[positive_param(jnp.asarray(0.1, dtype))] * Ns
        + [positive_param(jnp.asarray(1e-3, dtype)).fix()] * Nc
    )
    return CVIGP.init(jnp.asarray(t, dtype), jnp.asarray(Y, dtype), kern, lik,
                      observation=obs, parallel=parallel, chunk_size=chunk,
                      sqrt=sqrt)


def build_temporal(T, chunk, parallel=True, dtype=None):
    import jax.numpy as jnp

    from physs_gp_tpu.kernels import Matern32
    from physs_gp_tpu.likelihoods import Poisson
    from physs_gp_tpu.models import CVIGP

    dtype = dtype or jnp.float32
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 1000, T)).astype(np.float32)
    f = 1.2 * np.sin(0.1 * t)
    y = rng.poisson(np.exp(f)).astype(np.float32)
    return CVIGP.init(
        jnp.asarray(t, dtype), jnp.asarray(y, dtype)[:, None],
        Matern32(lengthscale=jnp.asarray(10.0, dtype),
                 variance=jnp.asarray(1.0, dtype)),
        Poisson(), parallel=parallel, chunk_size=chunk,
    )
