"""Library configuration constants — the explicit-dataclass replacement for
the reference's mutable global `settings` module (`stgp/settings.py:8-144`).

The reference mutates module globals (jitter, solver selection, filter
flags, CVI sample counts) from experiment drivers; that pattern is hostile
to jit tracing and reproducibility. Here every behavioural knob is an
explicit constructor argument on the relevant object:

| reference setting                      | here                                   |
|----------------------------------------|----------------------------------------|
| `jitter` / `ng_jitter`                 | `ops.matrix.default_jitter` (per dtype), `safe_cholesky(_rel)` args |
| `linear_solver` (CHOLESKY/CG/EXACT)    | Cholesky everywhere (TPU-optimal); sqrt filters replace fp64 fallbacks |
| `kalman_filter_force_symmetric`        | always on (`symmetrize` in every step) |
| `parallel_kf_force_linear_solve`       | obsolete (sqrt filters are the robust path) |
| filter type ('sequential'/'parallel'/'square_root') | `parallel=`, `sqrt=` model flags |
| `use_loop_mode` / `use_loops`          | obsolete (vmap/scan only)              |
| `force_black_box` / `use_quadrature`   | likelihood `gh_points` / MC `n_mc` args |
| `ng_samples`, `ng_f_samples`           | `NonlinearResidual.n_mc`, `GPRN.n_mc`  |
| `cvi_ng_exploit_space_time`            | always exploited (block sites per step) |
| `verbose` / citations registry         | none (standard logging / docstring refs)|

This module holds only true constants and a `Defaults` helper mirroring the
reference's `defaults.py:10-42` (default kernel/likelihood factories).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["Defaults", "default_kernel", "default_likelihood"]


def default_kernel(dtype=jnp.float64):
    """Default RBF kernel (ref `defaults.py:10` get_default_kernel)."""
    from .kernels.rbf import RBF
    from .utils.params import positive_param

    return RBF(
        lengthscales=positive_param(jnp.asarray(1.0, dtype)),
        variance=positive_param(jnp.asarray(1.0, dtype)),
    )


def default_likelihood(dtype=jnp.float64):
    """Default Gaussian likelihood (ref `defaults.py` get_default_likelihood)."""
    from .likelihoods.gaussian import Gaussian
    from .utils.params import positive_param

    return Gaussian(variance=positive_param(jnp.asarray(1.0, dtype)))


class Defaults:
    kernel = staticmethod(default_kernel)
    likelihood = staticmethod(default_likelihood)
