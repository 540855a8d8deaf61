"""Pendulum experiment: nonlinear-physics CVI extrapolation.

Reproduces the reference's `experiments/pendulum` workload: noisy angle data
on the first half of the window, the nonlinear residual
f'' + c f' + w² sin(f) = 0 enforced by collocation through the whole window;
report RMSE + NLPD on the unobserved half vs a physics-off baseline.

Run: PYTHONPATH=/root/repo python experiments/pendulum.py [--quick]
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import solve_ivp

from experiments.common import Timer, dump_results, parse_args, rmse
from physs_gp_tpu.kernels import Matern72
from physs_gp_tpu.zoo import nonlinear_ode_cvi_gp


def main():
    args = parse_args("pendulum")
    rng = np.random.default_rng(args.seed)
    c_true, w2 = 0.3, 9.0
    horizon, data_end = 5.0, 2.5
    n_data = 25 if args.quick else 40
    n_coll = 40 if args.quick else 80
    iters = 60 if args.quick else 250

    sol = solve_ivp(
        lambda s, x: [x[1], -c_true * x[1] - w2 * np.sin(x[0])],
        (0, horizon), [1.2, 0.0], dense_output=True, rtol=1e-9,
    )
    t_data = np.sort(rng.uniform(0, data_end, n_data))
    y_data = sol.sol(t_data)[0] + 0.03 * rng.normal(size=t_data.size)
    t_coll = np.linspace(0, horizon, n_coll)

    def residual(f):  # heads (f, f', f'')
        return f[..., 2] + c_true * f[..., 1] + w2 * jnp.sin(f[..., 0])

    def zero_residual(f):
        return jnp.zeros_like(f[..., 0])

    def train(res_fn):
        m = nonlinear_ode_cvi_gp(
            t_data, y_data, t_coll, res_fn, n_heads=3,
            kernel=Matern72(lengthscale=1.0, variance=1.0),
            noise=0.03 ** 2, coll_noise=1e-4, n_mc=16,
        )
        step = jax.jit(lambda mm: mm.step_with_elbo(0.3, hessian="gauss_newton"))
        elbos = []
        with Timer() as tm:
            for _ in range(iters):
                m, e = step(m)
            elbos.append(float(e))
        return m, elbos, tm.seconds

    m_on, e_on, t_on = train(residual)
    m_off, _, _ = train(zero_residual)

    t_test = np.linspace(data_end + 0.1, horizon, 50)
    truth = sol.sol(t_test)[0]
    p_on = jax.jit(lambda mm, ts: mm.predict_f(ts))(m_on, jnp.asarray(t_test))
    p_off = jax.jit(lambda mm, ts: mm.predict_f(ts))(m_off, jnp.asarray(t_test))

    results = {
        "config": {"quick": args.quick, "iters": iters, "c": c_true, "w2": w2},
        "metrics": {
            "rmse_extrap_physics_on": rmse(p_on.mean[:, 0], truth),
            "rmse_extrap_physics_off": rmse(p_off.mean[:, 0], truth),
            # model-API predictive density: Gaussian data head only (the
            # derivative heads get NaN targets) — ref `metrics/nlpd.py:44`
            "nlpd_extrap_physics_on": float(
                jax.jit(lambda mm, ts, ys: mm.nlpd(ts, ys))(
                    m_on, jnp.asarray(t_test),
                    jnp.stack(
                        [jnp.asarray(truth)]
                        + [jnp.full(truth.shape, jnp.nan)] * 2,
                        axis=1,
                    ),
                )
            ),
            "final_elbo": e_on[-1],
        },
        "meta": {"training_time": t_on},
    }
    dump_results(args.out, "pendulum", results)


if __name__ == "__main__":
    main()
