"""Driver benchmark: parallel-scan Kalman filter+smoother+ELBO throughput.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The measured quantity is the BASELINE.json driver metric — steps/sec of the
fused (parallel-scan filter + smoother + CVI ELBO) step on a long time series
on the TPU chip. `vs_baseline` is the speedup over the same-math sequential
`lax.scan` implementation on CPU (the reference's compute model: a
single-device sequential Kalman recursion — `stgp` has no parallel hardware
path beyond `associative_scan` on whatever device it runs on), measured in
the same run at a smaller T and scaled linearly (sequential filtering is
O(T) with a per-step constant independent of T).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from physs_gp_tpu.kernels import Matern32
    from physs_gp_tpu.likelihoods import Poisson
    from physs_gp_tpu.models import CVIGP

    T = 100_000
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 1000, T)).astype(np.float32)
    f = 1.2 * np.sin(0.1 * t)
    y = rng.poisson(np.exp(f)).astype(np.float32)

    def build(parallel, dtype, t_, y_):
        return CVIGP.init(
            jnp.asarray(t_, dtype),
            jnp.asarray(y_, dtype)[:, None],
            Matern32(lengthscale=jnp.asarray(10.0, dtype),
                     variance=jnp.asarray(1.0, dtype)),
            Poisson(),
            parallel=parallel,
            chunk_size=5000 if parallel else None,
        )

    # --- TPU parallel-scan step: elbo + natural-gradient site update ---
    tpu = jax.devices()[0]
    m = jax.device_put(build(True, jnp.float32, t, y), tpu)

    @jax.jit
    def step(model):
        new = model.natural_gradient_update(0.5)
        return new, new.elbo()

    m, e = step(m)
    jax.block_until_ready(e)
    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        m, e = step(m)
    jax.block_until_ready(e)
    tpu_step_s = (time.perf_counter() - t0) / n_iter
    steps_per_sec = T / tpu_step_s

    # --- CPU sequential reference (same math, lax.scan) at smaller T ---
    T_cpu = 20_000
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        mc = jax.device_put(build(False, jnp.float32, t[:T_cpu], y[:T_cpu]), cpu)
        step_cpu = jax.jit(
            lambda model: (lambda n: (n, n.elbo()))(
                model.natural_gradient_update(0.5)
            )
        )
        mc, ec = step_cpu(mc)
        jax.block_until_ready(ec)
        t0 = time.perf_counter()
        for _ in range(3):
            mc, ec = step_cpu(mc)
        jax.block_until_ready(ec)
        cpu_step_s = (time.perf_counter() - t0) / 3
    cpu_steps_per_sec = T_cpu / cpu_step_s

    print(
        json.dumps(
            {
                "metric": "parallel-scan KF+RTS+ELBO+natgrad steps/sec (T=100k, CVI Poisson, TPU fp32)",
                "value": round(steps_per_sec, 1),
                "unit": "steps/sec",
                "vs_baseline": round(steps_per_sec / cpu_steps_per_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
