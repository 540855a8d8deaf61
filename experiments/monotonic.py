"""Monotonic time-series experiment.

Reproduces the reference's `experiments/monotonic_timeseries` workload: noisy
samples of a monotone curve, a Probit head on f' ≥ 0 at dense collocation
points (ref `experiments/monotonic_timeseries/models/m_stgp.py:122-160`).

The demonstration regime is the one where the constraint can actually matter
(reference analogue: 100 sparse samples of 20·sin(100x)+100x, noise forcing
the unconstrained fit to wiggle, `setup_data.py:25`): the data leave a GAP
over the sigmoid's steep rise (t ∈ [1.2, 2.8] unobserved). An unconstrained
GP mean-reverts toward the zero prior inside the gap — it dips below the
left data level and sags under the truth (negative derivative = violation) —
while the constrained model bridges the gap monotonically. Headline metrics
are held-out RMSE/NLPD *inside the gap* plus the derivative-violation rate
for BOTH arms, so the constraint's effect is measured, not asserted.

Arms:
- constrained CVI  — `zoo.monotonic_cvi_gp` (Probit head on f' at t_coll)
- unconstrained    — identical model, probit column masked to NaN
  (`constrained=False`): same kernel/grid/heads, zero constraint information
- constrained VGP  — AutoIP-style batch natural-gradient VI
  (`zoo.deriv_vgp`, the reference's diff_vgp comparison arm)

Run: PYTHONPATH=/root/repo python experiments/monotonic.py [--quick]
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from experiments.common import Timer, dump_results, parse_args, rmse
from physs_gp_tpu.kernels import Matern72
from physs_gp_tpu.likelihoods.gaussian import Gaussian
from physs_gp_tpu.metrics import gaussian_nlpd
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.zoo import monotonic_cvi_gp

GAP = (1.2, 2.8)  # unobserved window over the sigmoid's steep rise


def _truth(t):
    return 2.0 / (1.0 + np.exp(-3.0 * (t - 2.0))) + 0.1 * t


def _fit_cvi(m, iters):
    step = jax.jit(lambda mm: mm.step_with_elbo(0.5))
    with Timer() as tm:
        for _ in range(iters):
            m, e = step(m)
        final = float(e)
    return m, final, tm.seconds


def _eval(m, t_test, noise):
    """(mean_f, var_f, dmean) on the test grid via the NaN-augmentation
    predictive path; heads are (f, f')."""
    pred = jax.jit(lambda mm, ts: mm.predict_f(ts))(m, jnp.asarray(t_test))
    mean = np.asarray(pred.mean)
    var = np.asarray(pred.var)
    return mean[:, 0], var[:, 0] + noise ** 2, mean[:, 1]


def main():
    args = parse_args("monotonic")
    rng = np.random.default_rng(args.seed)
    # the workload's regime is SPARSE data (reference: 100 aliased samples
    # of a fast oscillation) — n_data stays small in both modes; "full"
    # means denser collocation + more iterations, not more data (which would
    # pin the gap edges and erase the very ambiguity the constraint resolves)
    n_data = 30
    n_coll = 40 if args.quick else 100
    iters = 80 if args.quick else 300
    noise = 0.15

    # observed times avoid the gap entirely; collocation spans it densely
    t_pool = rng.uniform(0, 4, 4 * n_data)
    t_data = np.sort(t_pool[(t_pool < GAP[0]) | (t_pool > GAP[1])][:n_data])
    y_data = _truth(t_data) + noise * rng.normal(size=t_data.size)
    t_coll = np.linspace(0, 4, n_coll)
    t_test = np.linspace(0.05, 3.95, 120)
    in_gap = (t_test > GAP[0]) & (t_test < GAP[1])
    truth = _truth(t_test)

    m_c, final_elbo, t_fit = _fit_cvi(
        monotonic_cvi_gp(t_data, y_data, t_coll, noise=noise ** 2), iters
    )
    m_u, _, _ = _fit_cvi(
        monotonic_cvi_gp(t_data, y_data, t_coll, noise=noise ** 2,
                         constrained=False), iters
    )

    mean_c, vary_c, d_c = _eval(m_c, t_test, noise)
    mean_u, vary_u, d_u = _eval(m_u, t_test, noise)

    # AutoIP-style batch-VI arm (the reference's diff_vgp comparison,
    # `zoo/diff.py:93` + monotonic `m_stgp.py:122-160` lik_arr): same data,
    # Probit constraint column at the collocation grid, natural-gradient VI.
    from physs_gp_tpu.likelihoods import Probit
    from physs_gp_tpu.zoo import deriv_vgp

    t_all = np.concatenate([t_data, t_coll])
    Y_vgp = np.full((t_all.shape[0], 2), np.nan)
    Y_vgp[: n_data, 0] = y_data
    Y_vgp[n_data:, 1] = 1.0  # f' >= 0 pseudo-observations
    m_vgp = deriv_vgp(
        t_all[:, None], Y_vgp, time_diff=1, space_diff=None,
        kernel=Matern72(lengthscale=1.0, variance=1.0),
        liks=[Gaussian(variance=positive_param(noise ** 2)), Probit(nu=1e-2)],
        Z=np.linspace(0, 4, 30 if args.quick else 50)[:, None],
        whiten=False,
    )
    ng = jax.jit(lambda mm: mm.natural_gradient_update(0.5))
    with Timer() as tv:
        for _ in range(iters):
            m_vgp = ng(m_vgp)
    pv = jax.jit(lambda mm, ts: mm.predict_f(ts))(m_vgp, jnp.asarray(t_test))
    mean_v = np.asarray(pv.mean)[:, 0]
    d_v = np.asarray(pv.mean)[:, 1]

    def viol(d):
        return float(np.mean(d < -1e-3))

    results = {
        "config": {"quick": args.quick, "iters": iters, "gap": list(GAP),
                   "n_data": int(t_data.size)},
        "metrics": {
            # headline: held-out accuracy INSIDE the unobserved gap
            "rmse_gap": rmse(mean_c[in_gap], truth[in_gap]),
            "rmse_gap_unconstrained": rmse(mean_u[in_gap], truth[in_gap]),
            "nlpd_gap": float(gaussian_nlpd(
                truth[in_gap], mean_c[in_gap], vary_c[in_gap])),
            "nlpd_gap_unconstrained": float(gaussian_nlpd(
                truth[in_gap], mean_u[in_gap], vary_u[in_gap])),
            # violation rate over the whole test grid, BOTH arms
            "deriv_violation_rate": viol(d_c),
            "deriv_violation_rate_unconstrained": viol(d_u),
            # full-grid accuracy for context
            "rmse": rmse(mean_c, truth),
            "rmse_unconstrained": rmse(mean_u, truth),
            "final_elbo": final_elbo,
            # batch-VI arm
            "rmse_gap_vgp": rmse(mean_v[in_gap], truth[in_gap]),
            "deriv_violation_rate_vgp": viol(d_v),
        },
        "meta": {"training_time": t_fit, "training_time_vgp": tv.seconds},
    }
    dump_results(args.out, "monotonic", results)


if __name__ == "__main__":
    main()
