"""Scattered spatio-temporal sensor experiment (BASELINE config 4 analog).

Raw (t, x, y) rows from moving sensors — no grid — through the
TemporallyGroupedData + time-varying-H pipeline (`zoo.scattered_st_gp`,
ref `data/data.py:727` TemporallyGroupedData), with inducing sites Z from
k-means. Reports held-out RMSE/NLPD via the sort/unsort round trip.

Run: PYTHONPATH=/root/repo python experiments/scattered_st.py [--quick]
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from experiments.common import Timer, dump_results, parse_args, rmse
from physs_gp_tpu.metrics import gaussian_nlpd
from physs_gp_tpu.kernels import Matern32
from physs_gp_tpu.kernels.rbf import RBF
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.zoo import scattered_st_gp
from physs_gp_tpu.zoo.spatio_temporal import scattered_st_predict


def _field(t, s):
    return np.sin(1.2 * t + 2.0 * s[..., 0]) * np.cos(1.5 * s[..., 1])


def main():
    args = parse_args("scattered_st")
    rng = np.random.default_rng(args.seed)
    n_times = 60 if args.quick else 200
    noise = 0.05

    rows = []
    for tk in np.sort(rng.uniform(0, 8, n_times)):
        for _ in range(rng.integers(1, 5)):  # 1-4 moving sensors per step
            s = rng.uniform(-1, 1, 2)
            rows.append([tk, s[0], s[1],
                         _field(tk, s[None])[0] + noise * rng.normal()])
    A = np.array(rows)
    test = rng.uniform(size=A.shape[0]) < 0.2
    train_rows, test_rows = A[~test], A[test]

    # fp64 on CPU (reference-faithful), fp32 on TPU (no fp64 hardware)
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    with Timer() as tm:
        m, data = scattered_st_gp(
            train_rows[:, :3], train_rows[:, 3], n_inducing=12,
            k_time=Matern32(lengthscale=1.5, variance=1.0),
            k_space=RBF(lengthscales=positive_param(jnp.array([0.8, 0.8],
                                                              dtype)),
                        variance=positive_param(jnp.asarray(1.0, dtype))),
            noise=noise ** 2, dtype=dtype,
            parallel=jax.default_backend() != "cpu",
        )
        lml = float(jax.jit(lambda mm: mm.log_marginal_likelihood())(m))
        post = jax.jit(lambda mm: mm.posterior())(m)

    # train-row recovery via unsort (the public round-trip surface)
    mean_rows = data.unsort(np.asarray(post.mean))[:, 0]
    var_rows = data.unsort(np.asarray(post.var))[:, 0]
    truth_train = _field(train_rows[:, 0], train_rows[:, 1:3])

    # held-out rows: posterior at NEVER-SEEN (t, x, y) via the scattered
    # NaN-augmentation path (ref procedure: held-out metrics,
    # `experiments/ac/models/m_pigp.py:237-252`); scored against the NOISY
    # held-out observations (the reference scores y_test, not the latent)
    # and against the noise-free field for reference.
    p_test = scattered_st_predict(m, data, test_rows[:, :3])
    mean_test = np.asarray(p_test.mean)[:, 0]
    var_test = np.asarray(p_test.var)[:, 0]
    truth_test = _field(test_rows[:, 0], test_rows[:, 1:3])
    y_test = test_rows[:, 3]

    results = {
        "config": {"quick": args.quick, "n_rows": int(A.shape[0]),
                   "n_test_rows": int(test_rows.shape[0])},
        "metrics": {
            "lml": lml,
            "rmse_train_rows": rmse(mean_rows, truth_train),
            # observation-space density: latent var + observation noise
            "nlpd_train_rows": float(gaussian_nlpd(
                truth_train, mean_rows, var_rows + noise ** 2)),
            "rmse_test": rmse(mean_test, y_test),
            "nlpd_test": float(gaussian_nlpd(
                y_test, mean_test, var_test + noise ** 2)),
            "rmse_test_vs_truth": rmse(mean_test, truth_test),
        },
        "meta": {"training_time": tm.seconds},
    }
    dump_results(args.out, "scattered_st", results)


if __name__ == "__main__":
    main()
