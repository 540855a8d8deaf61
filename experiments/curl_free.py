"""Curl-free vector-field experiment.

Reproduces the reference's `experiments/curl_free_example`: observe a 2-D
curl-free field (gradient of a scalar potential) at scattered points, fit the
curl-free derivative-operator GP, report held-out RMSE/NLPD against a plain
independent-output GP.

Run: PYTHONPATH=/root/repo python experiments/curl_free.py [--quick]
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from experiments.common import Timer, dump_results, parse_args, rmse
from physs_gp_tpu.metrics import gaussian_nlpd
from physs_gp_tpu.kernels.rbf import RBF
from physs_gp_tpu.likelihoods.gaussian import Gaussian
from physs_gp_tpu.models import BatchGP
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.zoo import curl_free_gp


def _field(X):
    """∇φ with φ = sin(x) cos(y) — curl-free by construction."""
    x, y = X[:, 0], X[:, 1]
    return np.stack([np.cos(x) * np.cos(y), -np.sin(x) * np.sin(y)], axis=1)


def main():
    args = parse_args("curl_free")
    rng = np.random.default_rng(args.seed)
    n_train = 40 if args.quick else 120
    n_test = 60 if args.quick else 200
    noise = 0.05

    X = rng.uniform(-2, 2, (n_train, 2))
    Y = _field(X) + noise * rng.normal(size=(n_train, 2))
    Xs = rng.uniform(-1.8, 1.8, (n_test, 2))
    truth = _field(Xs)

    # fp64 on CPU (reference-faithful), fp32 on TPU (no fp64 hardware)
    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    with Timer() as tm:
        m = curl_free_gp(X, Y, noise=noise ** 2, dtype=dtype)
        pred = jax.jit(lambda mm, xs: mm.predict_f(xs))(m, jnp.asarray(Xs))
        # model-API predictive density (observation space)
        pred_y = jax.jit(lambda mm, xs: mm.predict_y(xs))(m, jnp.asarray(Xs))

    # independent-output baseline: one RBF GP per component
    base_preds = []
    for c in range(2):
        mb = BatchGP(
            X=jnp.asarray(X), Y=jnp.asarray(Y[:, c:c + 1]),
            kernel=RBF(lengthscales=positive_param(jnp.ones(2)),
                       variance=positive_param(1.0)),
            likelihood=Gaussian(variance=positive_param(noise ** 2)),
        )
        base_preds.append(jax.jit(lambda mm, xs: mm.predict_f(xs))(mb, jnp.asarray(Xs)))

    base_mean = np.stack([np.asarray(p.mean)[:, 0] for p in base_preds], axis=1)
    results = {
        "config": {"quick": args.quick, "n_train": n_train},
        "metrics": {
            "rmse": rmse(pred.mean, truth),
            "rmse_independent_gp": rmse(base_mean, truth),
            "nlpd": float(gaussian_nlpd(
                truth.reshape(np.asarray(pred_y.mean).shape),
                pred_y.mean, pred_y.var)),
        },
        "meta": {"training_time": tm.seconds},
    }
    dump_results(args.out, "curl_free", results)


if __name__ == "__main__":
    main()
