"""Helmholtz-decomposition flow experiment (state-space form).

Mirrors the reference's 3D-spatial-laser / Helmholtz workload
(`experiments/3d_spatial_laster/models/m_pigp.py:151-246`, `zoo/phi_ml.py:146,267`):
a (time + 2-D space) flow field decomposed into curl-free (potential φ) and
divergence-free (stream ψ) latent ST GPs, observed through fixed-mixing
spatial-derivative heads. The external laser dataset lives behind DVC in the
reference, so the driver uses a synthetic divergence-dominant flow with the
same structure. Reports held-out RMSE/NLPD of the flow and the
cross-component reconstruction error (v inferred where only u is observed).

Run: PYTHONPATH=/root/repo python experiments/helmholtz.py [--quick] [--cpu]
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

if "--cpu" in sys.argv:
    # env JAX_PLATFORMS alone is not always honored once the TPU plugin has
    # registered — the config update must precede any jax op (see ac.py)
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from experiments.common import Timer, dump_results, parse_args, rmse
from physs_gp_tpu.kernels import Matern32
from physs_gp_tpu.kernels.rbf import RBF
from physs_gp_tpu.metrics import gaussian_nlpd
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.zoo import helmholtz_st_gp, helmholtz_st_predict


def _flow(t, S):
    """φ = sin(x + 0.3 t) cos(y) (potential), ψ = 0.3 cos(x) sin(y − 0.2 t)
    (weak stream): flow = grad φ + rot ψ."""
    x, y = S[:, 0][None, :], S[:, 1][None, :]
    tt = np.asarray(t)[:, None]
    u = np.cos(x + 0.3 * tt) * np.cos(y) + 0.3 * np.cos(x) * np.cos(y - 0.2 * tt)
    v = -np.sin(x + 0.3 * tt) * np.sin(y) + 0.3 * np.sin(x) * np.sin(y - 0.2 * tt)
    return u, v


def main():
    args = parse_args("helmholtz")
    rng = np.random.default_rng(args.seed)
    T = 16 if args.quick else 64
    noise = 0.03
    t = np.sort(rng.uniform(0, 4, T))
    gx = np.linspace(-1.2, 1.2, 5)
    Z = np.stack(np.meshgrid(gx, gx), -1).reshape(-1, 2)
    Ns = Z.shape[0]
    u, v = _flow(t, Z)
    Y = np.concatenate(
        [u + noise * rng.normal(size=u.shape),
         v + noise * rng.normal(size=v.shape)], axis=1,
    )
    # hold out the v observations in the second half of the series — the
    # Helmholtz structure must reconstruct them from u alone
    hold = slice(T // 2, None)
    Y_train = Y.copy()
    Y_train[hold, Ns:] = np.nan

    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    k_t = Matern32(lengthscale=jnp.asarray(2.0, dtype),
                   variance=jnp.asarray(1.0, dtype))
    k_phi = RBF(lengthscales=positive_param(jnp.ones(2, dtype)),
                variance=positive_param(jnp.asarray(1.0, dtype)))
    k_psi = RBF(lengthscales=positive_param(jnp.ones(2, dtype)),
                variance=positive_param(jnp.asarray(0.1, dtype)))

    with Timer() as tm:
        m = helmholtz_st_gp(
            t, Y_train, Z, k_time=k_t, k_space=(k_phi, k_psi),
            noise=noise ** 2, dtype=dtype,
        )
        S_new = rng.uniform(-1.0, 1.0, (12, 2))
        pred = jax.jit(
            lambda mm, ss: helmholtz_st_predict(mm, ss)
        )(m, jnp.asarray(S_new, dtype))

    u_t, v_t = _flow(t, S_new)
    truth = np.concatenate([u_t, v_t], axis=1)
    mean = np.asarray(pred.mean)
    var = np.asarray(pred.var) + noise ** 2
    v_rec = mean[hold, 12:]
    results = {
        "config": {"quick": args.quick, "T": T, "n_sites": Ns},
        "metrics": {
            "rmse_flow": rmse(mean, truth),
            "nlpd_flow": float(gaussian_nlpd(truth, mean, var)),
            "rmse_v_reconstructed": rmse(v_rec, v_t[hold]),
            "rms_v_truth": float(np.sqrt(np.mean(v_t[hold] ** 2))),
        },
        "meta": {"training_time": tm.seconds},
    }
    dump_results(args.out, "helmholtz_st", results)


if __name__ == "__main__":
    main()
