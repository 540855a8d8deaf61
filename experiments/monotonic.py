"""Monotonic time-series experiment.

Reproduces the reference's `experiments/monotonic_timeseries` workload: noisy
samples of a monotone curve, a Probit head on f' ≥ 0 at dense collocation
points; report RMSE + NLPD on held-out times and the derivative-violation
rate vs an unconstrained GP.

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
from physs_gp_tpu.models import StateSpaceGP
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.zoo import monotonic_cvi_gp


def _truth(t):
    return 2.0 / (1.0 + np.exp(-3.0 * (t - 2.0))) + 0.1 * t


def main():
    args = parse_args("monotonic")
    rng = np.random.default_rng(args.seed)
    n_data = 30 if args.quick else 60
    n_coll = 40 if args.quick else 100
    iters = 80 if args.quick else 300

    t_data = np.sort(rng.uniform(0, 4, n_data))
    y_data = _truth(t_data) + 0.15 * rng.normal(size=n_data)
    t_coll = np.linspace(0, 4, n_coll)
    t_test = np.linspace(0.05, 3.95, 120)

    m = monotonic_cvi_gp(t_data, y_data, t_coll, noise=0.15 ** 2)
    step = jax.jit(lambda mm: mm.step_with_elbo(0.5))
    with Timer() as tm:
        for _ in range(iters):
            m, e = step(m)
        final_elbo = float(e)

    pred = jax.jit(lambda mm, ts: mm.predict_f(ts))(m, jnp.asarray(t_test))
    mean_f, var_f = np.asarray(pred.mean)[:, 0], np.asarray(pred.var)[:, 0]
    dmean = np.asarray(pred.mean)[:, 1]  # derivative head

    # unconstrained baseline
    m0 = StateSpaceGP(
        t=jnp.asarray(t_data), Y=jnp.asarray(y_data)[:, None],
        kernel=Matern72(lengthscale=1.0, variance=1.0),
        likelihood=Gaussian(variance=positive_param(0.15 ** 2)),
    )
    p0 = jax.jit(lambda mm, ts: mm.predict_f(ts))(m0, jnp.asarray(t_test))

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
        liks=[Gaussian(variance=positive_param(0.15 ** 2)), Probit(nu=1e-2)],
        Z=np.linspace(0, 4, 30 if args.quick else 50)[:, None],
        whiten=False,
    )
    ng = jax.jit(lambda mm: mm.natural_gradient_update(0.5))
    with Timer() as tv:
        for _ in range(iters):
            m_vgp = ng(m_vgp)
    pv = jax.jit(lambda mm, ts: mm.predict_f(ts))(m_vgp, jnp.asarray(t_test))

    truth = _truth(t_test)
    results = {
        "config": {"quick": args.quick, "iters": iters},
        "metrics": {
            "rmse": rmse(mean_f, truth),
            "rmse_unconstrained": rmse(np.asarray(p0.mean)[:, 0], truth),
            # model-API predictive density (per-head routing; probit head
            # masked out by NaN) — ref `metrics/nlpd.py:44`
            "nlpd": float(jax.jit(lambda mm, ts, ys: mm.nlpd(ts, ys))(
                m, jnp.asarray(t_test),
                jnp.stack([jnp.asarray(truth),
                           jnp.full(truth.shape, jnp.nan)], axis=1),
            )),
            "deriv_violation_rate": float(np.mean(dmean < -1e-3)),
            "final_elbo": final_elbo,
            "rmse_vgp": rmse(np.asarray(pv.mean)[:, 0], truth),
            "deriv_violation_rate_vgp": float(
                np.mean(np.asarray(pv.mean)[:, 1] < -1e-3)
            ),
        },
        "meta": {"training_time": tm.seconds, "training_time_vgp": tv.seconds},
    }
    dump_results(args.out, "monotonic", results)


if __name__ == "__main__":
    main()
