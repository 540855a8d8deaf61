"""Allen-Cahn experiment: nonlinear spatio-temporal physics CVI.

Reproduces the reference's `experiments/ac` workload shape: u_t = ε Δu + u − u³
on x ∈ [−1, 1]; noisy field data on the early time window only, the PDE
enforced by collocation through the whole window (linear part as exact
operator rows, u − u³ via the MC residual ELL); report extrapolation RMSE +
NLPD vs a physics-off model (ref `experiments/ac/models/m_pigp.py:133-195`).

Runs on the DEFAULT backend — on the TPU this means fp32 with the QR
square-root filters (`sqrt=True`, CLAUDE.md rule 3). The same collocation
noise (1e-5) as the fp64 reference run is usable at fp32 since the block
posterior S is built from the smoothed covariance FACTOR ((H L)(H L)^T, PSD
by construction; `ops/lgssm.py` project_cov_factor) — the earlier 1e-4 fp32
floor came from Cholesky-ing an indefinite H P H^T. `--cpu` forces the
reference-faithful CPU fp64 covariance-form run.

Measured (quick, seed 0): TPU fp32+sqrt rmse_on 0.123 / CPU fp64 0.19, both
vs physics-off 0.56 — the TPU run is the headline, not a fallback.

Run: PYTHONPATH=/root/repo python experiments/ac.py [--quick] [--cpu]
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

USE_CPU = "--cpu" in sys.argv

import jax

if USE_CPU:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from experiments.common import Timer, dump_results, parse_args, rmse
from physs_gp_tpu.kernels import Matern52
from physs_gp_tpu.kernels.rbf import RBF
from physs_gp_tpu.utils.params import positive_param
from physs_gp_tpu.utils.struct import replace
from physs_gp_tpu.zoo import allen_cahn_gp


def simulate(eps, t_end, nx=101, nt=4001):
    """Explicit FD solve with Neumann BCs."""
    xs = np.linspace(-1, 1, nx)
    dx = xs[1] - xs[0]
    dt = t_end / (nt - 1)
    u = 0.5 * np.sin(0.5 * np.pi * xs)
    U = [u.copy()]
    for _ in range(nt - 1):
        uxx = np.zeros_like(u)
        uxx[1:-1] = (u[2:] - 2 * u[1:-1] + u[:-2]) / dx ** 2
        uxx[0], uxx[-1] = uxx[1], uxx[-2]
        u = u + dt * (eps * uxx + u - u ** 3)
        U.append(u.copy())
    return xs, np.array(U)


def main():
    args = parse_args("ac")
    rng = np.random.default_rng(args.seed)
    eps, t_end, cut = 0.08, 3.5, 1.0
    T = 36 if args.quick else 56
    iters = 300 if args.quick else 900
    Ns, Nc = (8, 8) if args.quick else (10, 12)
    coll_noise = 1e-5  # same floor on every backend (factor-projected S)
    if USE_CPU:
        dtype, sqrt = jnp.float64, False
    else:
        # fp32 accelerator: QR square-root filters carry the tight noise
        dtype, sqrt = jnp.float32, True

    xs, U = simulate(eps, t_end)
    t = np.linspace(0, t_end, T)
    Z = np.linspace(-0.9, 0.9, Ns)[:, None]
    coll = np.linspace(-0.9, 0.9, Nc)[:, None]
    nt = U.shape[0]
    it = np.clip((t / t_end * (nt - 1)).astype(int), 0, nt - 1)
    F = np.array([np.interp(Z[:, 0], xs, U[k]) for k in it])
    Y = F + 0.02 * rng.normal(size=F.shape)
    Y[t > cut, :] = np.nan  # physics must carry the later window

    def train(m, seed=0):
        step = jax.jit(
            lambda mm, kk: mm.step_with_elbo(0.3, hessian="gauss_newton", key=kk)
        )
        key = jax.random.PRNGKey(seed)
        with Timer() as tm:
            for _ in range(iters):
                key, k = jax.random.split(key)
                m, e = step(m, k)
            final = float(e)
        return m, final, tm.seconds

    def build():
        return allen_cahn_gp(
            t, Y, Z, coll, epsilon=eps,
            k_time=Matern52(lengthscale=jnp.asarray(0.8, dtype),
                            variance=jnp.asarray(1.0, dtype)),
            k_space=RBF(lengthscales=positive_param(jnp.asarray([0.6], dtype)),
                        variance=positive_param(jnp.asarray(1.0, dtype))),
            noise=0.02 ** 2, coll_noise=coll_noise,
            n_mc=16 if args.quick else 32,
            dtype=dtype, sqrt=sqrt,
        )

    m_on, elbo_on, t_on = train(build())
    m_off = build()
    nc = m_off.likelihood.residual  # zero out the physics for the baseline
    m_off = replace(m_off, likelihood=replace(
        m_off.likelihood,
        residual=replace(nc, fn=lambda f: jnp.zeros(f.shape[:-1] + (Nc,), f.dtype)),
    ))
    m_off, _, _ = train(m_off)

    later = t > cut + 0.1
    post = jax.jit(lambda mm: mm.posterior())
    p_on, p_off = post(m_on), post(m_off)
    # model-API predictive density on the extrapolation window: truth at the
    # Ns grid heads, NaN at the collocation/operator heads
    y_nlpd = np.full((int(later.sum()), Ns + 2 * Nc), np.nan, float)
    y_nlpd[:, :Ns] = F[later]
    nlpd = float(
        jax.jit(lambda mm, ts, ys: mm.nlpd(ts, ys))(
            m_on, jnp.asarray(t[later], dtype), jnp.asarray(y_nlpd, dtype)
        )
    )
    results = {
        "config": {"quick": args.quick, "eps": eps, "T": T, "iters": iters,
                   "backend": "cpu-fp64" if USE_CPU else
                   f"{jax.devices()[0].platform}-fp32-sqrt"},
        "metrics": {
            "rmse_extrap_physics_on": rmse(
                np.asarray(p_on.mean)[later][:, :Ns], F[later]
            ),
            "rmse_extrap_physics_off": rmse(
                np.asarray(p_off.mean)[later][:, :Ns], F[later]
            ),
            "nlpd_extrap_physics_on": nlpd,
            "final_elbo": elbo_on,
        },
        "meta": {"training_time": t_on},
    }
    name = "ac" if USE_CPU else "ac_accel"
    dump_results(args.out, name, results)


if __name__ == "__main__":
    main()
