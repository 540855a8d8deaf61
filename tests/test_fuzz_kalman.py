"""Randomised equivalence fuzz over the filter/smoother variant matrix.

Random LGSSMs sweep the awkward corners — d=1 scalar paths, d=2 closed
forms, generic d, p > d and p < d, time-varying H, fully-missing steps,
partial NaN patterns, T not divisible by chunk_size (runner padding) — and
every parallel/chunked/sqrt variant must reproduce the sequential
covariance-form oracle (lml, filtered and smoothed moments).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.ops.kalman import kalman_filter, rts_smoother
from physs_gp_tpu.ops.lgssm import LGSSM
from physs_gp_tpu.ops.runner import run_filter_smoother


def _random_lgssm(seed, T, d, p, tv_H=False):
    rng = np.random.default_rng(seed)
    # stable-ish random transitions, PSD noise/obs covariances
    A = 0.9 * np.linalg.qr(rng.normal(size=(T, d, d)))[0]
    Qh = 0.3 * rng.normal(size=(T, d, d))
    Q = Qh @ np.swapaxes(Qh, -1, -2) + 0.05 * np.eye(d)
    Hsh = (T, p, d) if tv_H else (p, d)
    H = rng.normal(size=Hsh)
    Rh = 0.2 * rng.normal(size=(T, p, p))
    R = Rh @ np.swapaxes(Rh, -1, -2) + 0.1 * np.eye(p)
    m0 = rng.normal(size=d)
    P0h = 0.5 * rng.normal(size=(d, d))
    P0 = P0h @ P0h.T + 0.2 * np.eye(d)
    y = rng.normal(size=(T, p))
    # missing patterns: one fully-missing step, scattered partial NaNs
    y[T // 3] = np.nan
    mask = rng.uniform(size=(T, p)) < 0.15
    y[mask] = np.nan
    j = jnp.asarray
    ssm = LGSSM(A=j(A), Q=j(Q), H=j(H), m0=j(m0), P0=j(P0))
    return ssm, j(R), j(y)


CASES = [
    # (seed, T, d, p, tv_H, chunk)
    (0, 40, 1, 1, False, None),
    (1, 40, 2, 1, False, 8),
    (2, 48, 2, 3, False, 16),   # p > d
    (3, 48, 5, 2, True, 12),    # time-varying H
    (4, 50, 3, 3, False, 16),   # T % chunk != 0 -> runner pads
    (5, 36, 4, 6, True, 9),     # p > d, tv H, odd chunk
]


@pytest.mark.parametrize("seed,T,d,p,tv_H,chunk", CASES)
@pytest.mark.parametrize("sqrt", [False, True])
def test_variants_match_sequential_oracle(seed, T, d, p, tv_H, chunk, sqrt):
    ssm, R, y = _random_lgssm(seed, T, d, p, tv_H)

    f_ref = kalman_filter(ssm.A, ssm.Q, ssm.H, R, y, ssm.m0, ssm.P0)
    s_ref = rts_smoother(ssm.A, ssm.Q, f_ref)

    f, s = jax.jit(
        lambda ssm, R, y: run_filter_smoother(
            ssm, R, y, parallel=True, sqrt=sqrt, chunk_size=chunk
        )
    )(ssm, R, y)

    np.testing.assert_allclose(float(f.lml), float(f_ref.lml), rtol=1e-8)
    np.testing.assert_allclose(f.ms, f_ref.ms, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(f.Ps, f_ref.Ps, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(s.ms, s_ref.ms, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(s.Ps, s_ref.Ps, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("sqrt", [False, True])
def test_blocked_schedule_fuzz(monkeypatch, sqrt):
    """Same oracle under the TPU-default blocked inner-scan schedule."""
    monkeypatch.setenv("PHYSS_INNER_SCAN", "blocked")
    monkeypatch.setenv("PHYSS_SCAN_BLOCKS", "4")
    ssm, R, y = _random_lgssm(7, 48, 3, 2, True)
    f_ref = kalman_filter(ssm.A, ssm.Q, ssm.H, R, y, ssm.m0, ssm.P0)
    s_ref = rts_smoother(ssm.A, ssm.Q, f_ref)
    f, s = run_filter_smoother(ssm, R, y, parallel=True, sqrt=sqrt,
                               chunk_size=12)
    np.testing.assert_allclose(float(f.lml), float(f_ref.lml), rtol=1e-8)
    np.testing.assert_allclose(s.ms, s_ref.ms, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(s.Ps, s_ref.Ps, rtol=1e-6, atol=1e-8)


@pytest.mark.slow
@pytest.mark.parametrize("sqrt", [False, True])
def test_gradient_matches_sequential_oracle(sqrt):
    """d lml / d(inputs) of the chunked parallel pass == the sequential
    oracle's, on a random dense-R, time-varying-H model with NaN patterns."""
    ssm, R, y = _random_lgssm(11, 24, 3, 2, tv_H=True)

    def lml_seq(Q, R):
        return kalman_filter(ssm.A, Q, ssm.H, R, y, ssm.m0, ssm.P0).lml

    def lml_par(Q, R):
        f, _ = run_filter_smoother(
            ssm._replace(Q=Q), R, y, parallel=True, sqrt=sqrt, chunk_size=8
        )
        return f.lml

    gq_s, gr_s = jax.grad(lml_seq, argnums=(0, 1))(ssm.Q, R)
    gq_p, gr_p = jax.grad(lml_par, argnums=(0, 1))(ssm.Q, R)
    # compare the SYMMETRIC part only: Q/R are covariances, and the
    # asymmetric component of d lml/dQ is gauge (the paths symmetrize at
    # different points, so it differs while every directional derivative
    # along symmetric perturbations agrees)
    sym = lambda G: 0.5 * (G + jnp.swapaxes(G, -1, -2))
    np.testing.assert_allclose(sym(gq_p), sym(gq_s), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(sym(gr_p), sym(gr_s), rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("sqrt", [False, True])
def test_sharded_matches_sequential_oracle(sqrt):
    """Time-sharded mesh pass vs the sequential oracle on a random dense-R,
    time-varying-H model with NaN patterns (the class of corner where the
    sqrt noise-factor masking bug lived)."""
    from jax.sharding import Mesh

    ssm, R, y = _random_lgssm(13, 64, 3, 2, tv_H=True)
    f_ref = kalman_filter(ssm.A, ssm.Q, ssm.H, R, y, ssm.m0, ssm.P0)
    s_ref = rts_smoother(ssm.A, ssm.Q, f_ref)

    mesh = Mesh(np.array(jax.devices()[:4]), ("t",))
    f, s = jax.jit(
        lambda ssm, R, y: run_filter_smoother(
            ssm, R, y, parallel=True, sqrt=sqrt, chunk_size=8, mesh=mesh
        )
    )(ssm, R, y)
    np.testing.assert_allclose(float(f.lml), float(f_ref.lml), rtol=1e-8)
    np.testing.assert_allclose(f.ms, f_ref.ms, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(s.ms, s_ref.ms, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(s.Ps, s_ref.Ps, rtol=1e-6, atol=1e-8)


def test_cov_smoother_on_sqrt_filter_result():
    """run_filter(sqrt=True) returns COVARIANCE-form results; composing the
    covariance smoother on them must be exact — i.e. the sqrt PREDICTED
    FACTOR byproduct (FilterResult.Pp) must not leak through the
    squaring boundary (it would be misread as a dense covariance)."""
    from physs_gp_tpu.ops.parallel_kalman import parallel_rts_smoother
    from physs_gp_tpu.ops.runner import run_filter

    ssm, R, y = _random_lgssm(17, 32, 3, 2)
    f_cov, _ = run_filter(ssm, R, y, parallel=True, sqrt=True)
    assert f_cov.Pp is None  # factor byproduct dropped at the boundary
    s = parallel_rts_smoother(ssm.A, ssm.Q, f_cov)

    f_ref = kalman_filter(ssm.A, ssm.Q, ssm.H, R, y, ssm.m0, ssm.P0)
    s_ref = rts_smoother(ssm.A, ssm.Q, f_ref)
    np.testing.assert_allclose(s.ms, s_ref.ms, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(s.Ps, s_ref.Ps, rtol=1e-6, atol=1e-8)
