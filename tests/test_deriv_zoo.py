"""Derivative-observation zoo gates (ref `zoo/diff.py`, `zoo/sde_diff.py`).

Cross-gates the three INDEPENDENT constructions of the same model:
- `deriv_gp` (batch, nested-autodiff DerivativeKernel),
- `deriv_sde_gp` (temporal Markov state reads),
- `deriv_st_gp` (Markov time x spatial-conditional space, hierarchical) —
the lml of all must agree, which checks `derivative_row`'s balanced-basis
scaling, the autodiff derivative tower (incl. the |τ| diagonal), the
`OnDims` product routing, and the `s_grad`/`s_grad2` conditionals against
each other. NaN patterns included throughout.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from physs_gp_tpu.kernels import RBF, Matern32, Matern52, OnDims
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.zoo import deriv_gp, deriv_sde_gp, deriv_st_gp, diff_orders


def _rbf(ds, seed=0):
    rng = np.random.default_rng(seed)
    return RBF(
        lengthscales=positive_param(jnp.asarray(rng.uniform(0.6, 1.2, ds))),
        variance=positive_param(1.1),
    )


def test_diff_orders_spec():
    assert diff_orders(None) == ()
    assert diff_orders(0) == ()
    assert diff_orders(1) == (1,)
    assert diff_orders(2) == (1, 2)
    assert diff_orders(-2) == (2,)
    with pytest.raises(ValueError):
        diff_orders(-1)


@pytest.mark.parametrize("time_diff,parallel,sqrt", [
    (1, False, False),
    (2, True, False),
    (2, True, True),
    (-2, False, False),
])
def test_temporal_sde_matches_batch(time_diff, parallel, sqrt):
    rng = np.random.default_rng(0)
    T = 9
    t = np.sort(rng.uniform(0, 3, T))
    P = 1 + len(diff_orders(time_diff))
    Y = rng.normal(size=(T, P))
    Y[2, 0] = np.nan
    Y[5, P - 1] = np.nan
    k = Matern52(lengthscale=0.7, variance=1.3)
    noise = [0.05 + 0.01 * p for p in range(P)]
    m_ss = deriv_sde_gp(t, Y, time_diff, kernel=k, noise=noise,
                        parallel=parallel, sqrt=sqrt)
    m_b = deriv_gp(t[:, None], Y, time_diff, space_diff=None, kernel=k,
                   noise=noise)
    np.testing.assert_allclose(
        float(m_ss.log_marginal_likelihood()),
        float(m_b.log_marginal_likelihood()),
        rtol=1e-8,
    )


def _kd(k, a, b):
    """Closed form or autodiff fallback — the DerivativeKernel contract."""
    from physs_gp_tpu.kernels.base import autodiff_deriv_fn

    return k.k_deriv_fn(a, b) or autodiff_deriv_fn(k.k_scalar, a, b)


def _d1(i):
    """op: kfn -> (s, z) -> ∂_{s_i} kfn(s, z)."""
    return lambda kfn: lambda s, z: jax.grad(kfn, argnums=0)(s, z)[i]


def _d2(i):
    return lambda kfn: lambda s, z: jax.grad(
        lambda ss: jax.grad(kfn, argnums=0)(ss, z)[i]
    )(s)[i]


def _cross(fn, A, B):
    return np.asarray(
        jax.vmap(lambda a: jax.vmap(lambda b: fn(a, b))(B))(A)
    )


def _hierarchical_dense_lml(t, Y, Z, Zs, k_t, k_s, s_orders, noise,
                            correction):
    """Independent dense oracle of the HIERARCHICAL (DTC) generative model:
    state = separable GP at sites Zs; head (t_order o, spatial op L) reads
    c·(W_L ⊗ t-deriv) of the state (W_L = (L k_s)(Z, Zs) Kzz^{-1}), plus the
    per-row conditional-variance residual as independent noise when
    `correction` —

        C[(t,h,i),(t',h',j)] = k_t^{(o_h,o_{h'})}(t,t') · [W_h Kzz W_{h'}ᵀ]_{ij}
                               + δ·(corr + noise),

    spatial parts by plain nested autodiff of k_s (independent of the
    package's K_op closed forms / Kron-lift code paths)."""
    T, Ns = len(t), Z.shape[0]
    ks = k_s.k_scalar
    Kzz = _cross(lambda a, b: ks(a, b), Zs, Zs)
    Kzz_i = np.linalg.inv(Kzz + 1e-12 * np.eye(len(Zs)))
    # heads: (t_order, spatial op or None)
    heads = [(0, None), (1, None)]
    for i in range(Z.shape[1]):
        for o in s_orders:
            heads.append((0, (_d1(i) if o == 1 else _d2(i))))
    P = len(heads)
    Ws, corrs = [], []
    for o, L in heads:
        cross = _cross(L(ks) if L else ks, Z, Zs)  # (L k_s)(Z, Zs)
        W = cross @ Kzz_i
        Ws.append(W)
        if correction:
            if L is None:
                kss = np.asarray(jax.vmap(lambda z: ks(z, z))(Z))
            else:
                # (L ⊗ L' k)(s, s): L on the first arg, then L on the
                # second via the swap trick
                f1 = L(ks)  # (L k)(s, z)
                f1s = lambda z, s, f1=f1: f1(s, z)
                both = L(f1s)  # (z, s) -> L_z (L_s k)(s, z)
                kss = np.asarray(jax.vmap(lambda z: both(z, z))(Z))
            resid = np.maximum(kss - np.sum(W * cross, axis=1), 0.0)
            tvar = float(_kd(k_t, (0,) * o, (0,) * o)(t[:1], t[:1]))
            corrs.append(tvar * resid)
        else:
            corrs.append(np.zeros(Ns))
    # temporal derivative blocks [P, P, T, T]
    tj = jnp.asarray(t)
    KT = np.empty((P, P, T, T))
    for p, (o, _) in enumerate(heads):
        for q, (o2, _) in enumerate(heads):
            fn = _kd(k_t, (0,) * o, (0,) * o2)
            KT[p, q] = _cross(fn, tj, tj)
    M = np.einsum("pik,kl,qjl->piqj", np.stack(Ws), Kzz, np.stack(Ws))
    C = np.einsum("pqts,piqj->tpisqj", KT, M).reshape(T * P * Ns, T * P * Ns)
    diag = np.tile((np.stack(corrs) + np.asarray(noise)[:, None]).ravel(), T)
    y = np.ravel(Y)
    m = ~np.isnan(y)
    Cm = C[np.ix_(m, m)] + np.diag(diag[m])
    sign, logdet = np.linalg.slogdet(Cm)
    yv = y[m]
    return -0.5 * (yv @ np.linalg.solve(Cm, yv) + logdet
                   + m.sum() * np.log(2 * np.pi))


@pytest.mark.parametrize("space_diff,sparse", [(1, False), (2, False),
                                               (-2, False), (1, True)])
def test_st_sde_matches_dense_oracle(space_diff, sparse):
    """The hierarchical ST filter lml == the hand-built dense covariance of
    the SAME generative model (NOT the full batch joint — the spatial
    operator reads are conditionals through f(Z), the reference's
    hierarchical semantics, `zoo/sde_diff.py:335`)."""
    rng = np.random.default_rng(1)
    T, Ns, ds = 6, 4, 2
    t = np.sort(rng.uniform(0, 2, T))
    Z = rng.uniform(-1, 1, (Ns, ds))
    Zs = rng.uniform(-1, 1, (3, ds)) if sparse else Z
    k_t = Matern32(lengthscale=0.8, variance=1.2)
    k_s = _rbf(ds, seed=2)
    s_orders = diff_orders(space_diff)
    n_heads = 1 + 1 + ds * len(s_orders)
    Y = rng.normal(size=(T, n_heads * Ns))
    Y[1, 2] = np.nan
    Y[3, Ns + 1] = np.nan
    Y[4, (n_heads - 1) * Ns] = np.nan
    noise = [0.05 + 0.01 * h for h in range(n_heads)]
    m_st = deriv_st_gp(t, Y, Z, time_diff=1, space_diff=space_diff,
                       k_time=k_t, k_space=k_s, noise=noise, parallel=True,
                       Zs=Zs if sparse else None)
    lml = float(jax.jit(lambda m: m.log_marginal_likelihood())(m_st))
    oracle = _hierarchical_dense_lml(t, Y, Z, jnp.asarray(Zs), k_t, k_s,
                                     s_orders, noise, correction=sparse)
    np.testing.assert_allclose(lml, oracle, rtol=1e-7)


def test_separable_product_deriv_routing():
    """ProductKernel.k_deriv_fn over disjoint OnDims factors: an RBF⊗RBF
    separable product IS a full RBF with stacked lengthscales — deriv_gp
    lml through the per-factor routing must equal the single-kernel
    autodiff tower exactly."""
    rng = np.random.default_rng(4)
    N, D = 7, 3
    X = rng.uniform(-1, 1, (N, D))
    ls = rng.uniform(0.6, 1.2, D)
    k_full = RBF(lengthscales=positive_param(jnp.asarray(ls)),
                 variance=positive_param(1.3))
    k_prod = OnDims(
        base=RBF(lengthscales=positive_param(jnp.asarray(ls[:1])),
                 variance=positive_param(1.3)),
        dims=(0,),
    ) * OnDims(
        base=RBF(lengthscales=positive_param(jnp.asarray(ls[1:])),
                 variance=positive_param(1.0)),
        dims=(1, 2),
    )
    P = 1 + 1 + (D - 1)  # f, dt, dx_i
    Y = rng.normal(size=(N, P))
    Y[2, 1] = np.nan
    m1 = deriv_gp(X, Y, time_diff=1, space_diff=1, kernel=k_full, noise=0.1)
    m2 = deriv_gp(X, Y, time_diff=1, space_diff=1, kernel=k_prod, noise=0.1)
    np.testing.assert_allclose(
        float(m1.log_marginal_likelihood()),
        float(m2.log_marginal_likelihood()),
        rtol=1e-9,
    )


def test_matern_k_deriv_fn_offdiag_matches_autodiff():
    """Off the τ=0 diagonal the autodiff tower IS correct for Matérn —
    the closed form must agree there (the diagonal is where they differ,
    and the SS cross-gates above pin the diagonal)."""
    from physs_gp_tpu.kernels.base import autodiff_deriv_fn

    k = Matern52(lengthscale=0.7, variance=1.3)
    x1 = jnp.asarray([0.9])
    x2 = jnp.asarray([0.2])
    for m in range(3):
        for n in range(3):
            a, b = (0,) * m, (0,) * n
            closed = _kd(k, a, b)(x1, x2)
            auto = autodiff_deriv_fn(k.k_scalar, a, b)(x1, x2)
            np.testing.assert_allclose(float(closed), float(auto), rtol=1e-9)
            # and the swapped-sign direction
            closed2 = _kd(k, a, b)(x2, x1)
            auto2 = autodiff_deriv_fn(k.k_scalar, a, b)(x2, x1)
            np.testing.assert_allclose(float(closed2), float(auto2),
                                       rtol=1e-9)


def test_grad2_closed_form_matches_autodiff():
    """RBF.K_op('grad2', i) == the nested-autodiff spatial conditional."""
    from physs_gp_tpu.kernels.spatio_temporal import SpatioTemporalKernel
    from physs_gp_tpu.transforms.operators import s_grad2

    rng = np.random.default_rng(3)
    Z = jnp.asarray(rng.uniform(-1, 1, (5, 2)))
    S = jnp.asarray(rng.uniform(-1, 1, (3, 2)))
    kern = SpatioTemporalKernel(
        k_time=Matern32(lengthscale=1.0, variance=1.0),
        k_space=_rbf(2, seed=4), Z=Z,
    )
    for i in range(2):
        op = s_grad2(i)
        closed = kern._op_cross(S, op)

        def bare(k, s, z, op=op):
            return op(k, s, z)

        auto = kern._op_cross(S, bare)  # no .kind -> autodiff path
        np.testing.assert_allclose(np.asarray(closed), np.asarray(auto),
                                   rtol=1e-9, atol=1e-12)


def test_st_sparse_variant_runs():
    """Zs != data sites: heads gain the operator-read DTC correction."""
    rng = np.random.default_rng(5)
    T, Ns, ds = 5, 6, 1
    t = np.sort(rng.uniform(0, 2, T))
    Z = np.linspace(-1, 1, Ns)[:, None]
    Zs = np.linspace(-1, 1, 3)[:, None]
    n_heads = 3  # f, dt, dx
    Y = rng.normal(size=(T, n_heads * Ns))
    m = deriv_st_gp(t, Y, Z, time_diff=1, space_diff=1, Zs=Zs,
                    k_space=_rbf(1, seed=6), noise=0.1)
    m_dense = deriv_st_gp(t, Y, Z, time_diff=1, space_diff=1,
                          k_space=_rbf(1, seed=6), noise=0.1)
    lml = float(jax.jit(lambda mm: mm.log_marginal_likelihood())(m))
    assert np.isfinite(lml)
    # DTC likelihood differs from the dense-sites model (correction active)
    assert abs(lml - float(m_dense.log_marginal_likelihood())) > 1e-6


def test_st_cvi_tight():
    rng = np.random.default_rng(7)
    T, Ns = 5, 3
    t = np.sort(rng.uniform(0, 2, T))
    Z = rng.uniform(-1, 1, (Ns, 2))
    Y = rng.normal(size=(T, 3 * Ns))  # f, dt, (space_diff=None -> ds*0)...
    m = deriv_st_gp(t, Y, Z, time_diff=2, space_diff=None,
                    k_time=Matern52(lengthscale=0.9, variance=1.0),
                    k_space=_rbf(2), noise=0.05, cvi=True)
    m1, _ = jax.jit(lambda mm: mm.step_with_elbo(1.0))(m)
    _, elbo = m1.step_with_elbo(1.0)
    exact = deriv_st_gp(t, Y, Z, time_diff=2, space_diff=None,
                        k_time=Matern52(lengthscale=0.9, variance=1.0),
                        k_space=_rbf(2), noise=0.05)
    np.testing.assert_allclose(
        float(elbo), float(exact.log_marginal_likelihood()), rtol=1e-8
    )


def test_vgp_conjugate_matches_exact():
    """deriv_vgp (Z = X, Gaussian heads, unwhitened) + one lr=1 natural-
    gradient step reaches the exact posterior: ELBO == deriv_gp lml."""
    from physs_gp_tpu.zoo import deriv_vgp

    rng = np.random.default_rng(8)
    N = 6
    X = np.sort(rng.uniform(0, 2, N))[:, None]
    Y = rng.normal(size=(N, 3))
    Y[2, 1] = np.nan
    k = Matern52(lengthscale=0.8, variance=1.1)
    m = deriv_vgp(X, Y, time_diff=2, space_diff=None, kernel=k, noise=0.1,
                  whiten=False)
    m = jax.jit(lambda mm: mm.natural_gradient_update(1.0))(m)
    exact = deriv_gp(X, Y, time_diff=2, space_diff=None, kernel=k, noise=0.1)
    np.testing.assert_allclose(
        float(m.elbo()), float(exact.log_marginal_likelihood()), rtol=1e-7
    )


def test_vgp_probit_monotonicity():
    """A Probit constraint head on f' (y=1 rows) pulls the posterior
    derivative positive where unconstrained data says otherwise — the
    AutoIP monotonic construction (ref `zoo/diff.py:93` lik_arr)."""
    from physs_gp_tpu.likelihoods import Gaussian, Probit
    from physs_gp_tpu.utils.params import positive_param as pp
    from physs_gp_tpu.zoo import deriv_vgp

    rng = np.random.default_rng(9)
    N = 12
    X = np.linspace(0, 3, N)[:, None]
    # noisy samples of a monotone function; noise suggests local decreases
    f = np.tanh(X[:, 0] - 1.5)
    Y = np.stack([f + 0.25 * rng.normal(size=N), np.ones(N)], axis=1)
    k = Matern52(lengthscale=1.0, variance=1.0)
    liks = [Gaussian(variance=pp(0.05)), Probit(nu=1e-2)]

    def fit_on(Y, liks):
        m = deriv_vgp(X, Y, time_diff=1, space_diff=None, kernel=k,
                      liks=liks, whiten=False)
        step = jax.jit(lambda mm: mm.natural_gradient_update(0.5))
        for _ in range(25):
            m = step(m)
        return np.asarray(m.predict_f(X).mean)[:, 1]

    d_con = fit_on(Y, liks)
    assert (d_con > -1e-3).all(), d_con
    # the unconstrained model (constraint column all-NaN → masked out)
    # admits negative derivatives for this draw — the constraint does work
    Y_un = Y.copy()
    Y_un[:, 1] = np.nan
    d_un = fit_on(Y_un, liks)
    assert d_un.min() < d_con.min() - 1e-4


def test_vgp_predict_y_per_output():
    """predict_y routes per column: Gaussian head = f moments + noise
    (quadrature of the identity is exact), Probit head = a probability."""
    from physs_gp_tpu.likelihoods import Gaussian, Probit
    from physs_gp_tpu.utils.params import positive_param as pp
    from physs_gp_tpu.zoo import deriv_vgp

    rng = np.random.default_rng(10)
    N = 8
    X = np.linspace(0, 2, N)[:, None]
    Y = np.stack([rng.normal(size=N), np.ones(N)], axis=1)
    m = deriv_vgp(X, Y, time_diff=1, space_diff=None,
                  kernel=Matern52(lengthscale=0.9, variance=1.0),
                  liks=[Gaussian(variance=pp(0.04)), Probit(nu=1e-2)],
                  whiten=False)
    m = jax.jit(lambda mm: mm.natural_gradient_update(0.5))(m)
    f = m.predict_f(X)
    y = m.predict_y(X)
    np.testing.assert_allclose(np.asarray(y.mean)[:, 0],
                               np.asarray(f.mean)[:, 0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y.var)[:, 0],
                               np.asarray(f.var)[:, 0] + 0.04, rtol=1e-5)
    p = np.asarray(y.mean)[:, 1]
    assert ((p >= 0) & (p <= 1)).all()
    assert np.asarray(y.var)[:, 1].max() <= 0.2500001  # Bernoulli bound


def test_matern_deriv_multidim_raises():
    """Matern closed form is 1-D: a multi-D Matern base in DerivativeKernel
    must raise at trace time (previously returned a Gram that silently
    dropped every input dim but the first), while the value-only op list
    stays exact for any D via k_scalar."""
    from physs_gp_tpu.kernels import DerivativeKernel

    k = Matern52(lengthscale=0.9, variance=1.2)
    X = np.array([[0.3, 1.0], [0.3, -1.0]])
    kv = DerivativeKernel(base=k, ops=((),))
    np.testing.assert_allclose(
        np.asarray(kv.K(X, X))[0, 1],
        float(k.k_scalar(jnp.asarray(X[0]), jnp.asarray(X[1]))),
        rtol=1e-12,
    )
    kd = DerivativeKernel(base=k, ops=((), (1,)))
    with pytest.raises(ValueError, match="1-D"):
        kd.K(X, X)


def test_matern_product_without_ondims_raises():
    """A Matern-containing product that cannot factorise over disjoint
    OnDims dims must raise, not silently run the (wrong-at-tau=0)
    autodiff tower."""
    from physs_gp_tpu.kernels import DerivativeKernel

    k = Matern32(lengthscale=0.7, variance=1.3) * RBF(
        lengthscales=positive_param(jnp.asarray([0.9])),
        variance=positive_param(1.1),
    )
    kd = DerivativeKernel(base=k, ops=((), (0,)))
    X = np.linspace(0, 1, 3)[:, None]
    with pytest.raises(ValueError, match="OnDims"):
        kd.K_diag(X)


def test_vgp_1d_Z_is_column():
    """1-D inducing arrays are N points in 1-D (column), like X."""
    from physs_gp_tpu.zoo import deriv_vgp

    rng = np.random.default_rng(11)
    X = np.sort(rng.uniform(0, 2, 7))
    Y = rng.normal(size=(7, 2))
    Zc = np.linspace(0, 2, 5)
    m1 = deriv_vgp(X, Y, time_diff=1, space_diff=None,
                   kernel=Matern52(lengthscale=0.8, variance=1.0), Z=Zc)
    m2 = deriv_vgp(X, Y, time_diff=1, space_diff=None,
                   kernel=Matern52(lengthscale=0.8, variance=1.0),
                   Z=Zc[:, None])
    assert m1.Z.shape == (5, 1)
    np.testing.assert_allclose(float(m1.elbo()), float(m2.elbo()), rtol=1e-12)
    with pytest.raises(ValueError, match="input dims"):
        deriv_vgp(X, Y, time_diff=1, space_diff=None,
                  kernel=Matern52(lengthscale=0.8, variance=1.0),
                  Z=np.zeros((4, 2)))


def test_column_count_errors():
    t = np.linspace(0, 1, 4)
    with pytest.raises(ValueError, match="columns"):
        deriv_sde_gp(t, np.zeros((4, 2)), time_diff=2)
    with pytest.raises(ValueError, match="columns"):
        deriv_gp(t[:, None], np.zeros((4, 3)), time_diff=1, space_diff=None)
    with pytest.raises(ValueError, match="columns"):
        deriv_st_gp(t, np.zeros((4, 5)), np.zeros((2, 1)), time_diff=1,
                    space_diff=1)
