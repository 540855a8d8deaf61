"""Driver benchmark: parallel-scan Kalman filter+smoother+ELBO throughput.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measured quantity (BASELINE.json driver metric): steps/sec of the fused
(parallel-scan filter + smoother + ELBO + CVI natural-gradient site update)
iteration of the paper's flagship model family — a variational state-space GP
with non-Gaussian (Poisson) likelihood — at T = 100k steps on the TPU chip.

`vs_baseline` is the speedup over the same-math SEQUENTIAL `lax.scan`
implementation on CPU (the reference's compute model: a single-device
sequential Kalman recursion), measured in the same run at T = 20k and scaled
linearly (sequential filtering is O(T) with a T-independent per-step cost).
"""
import json
import time

import numpy as np


def _build(parallel, dtype, t_, y_, chunk):
    import jax.numpy as jnp

    from physs_gp_tpu.kernels import Matern32
    from physs_gp_tpu.likelihoods import Poisson
    from physs_gp_tpu.models import CVIGP

    return CVIGP.init(
        jnp.asarray(t_, dtype),
        jnp.asarray(y_, dtype)[:, None],
        Matern32(lengthscale=jnp.asarray(10.0, dtype),
                 variance=jnp.asarray(1.0, dtype)),
        Poisson(),
        parallel=parallel,
        chunk_size=chunk,
    )


def main():
    import jax
    import jax.numpy as jnp

    T = 100_000
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 1000, T)).astype(np.float32)
    f = 1.2 * np.sin(0.1 * t)
    y = rng.poisson(np.exp(f)).astype(np.float32)

    # --- TPU parallel-scan CVI iteration (single fused graph) ---
    m = _build(True, jnp.float32, t, y, chunk=5000)

    @jax.jit
    def step(model):
        return model.step_with_elbo(0.5)

    m2, e = step(m)
    _ = float(e)  # host sync (block_until_ready is unreliable on this relay)
    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        m2, e = step(m2)
    _ = float(e)
    tpu_step_s = (time.perf_counter() - t0) / n_iter
    steps_per_sec = T / tpu_step_s

    # --- CPU sequential reference (same math, lax.scan) at smaller T ---
    T_cpu = 20_000
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        mc = jax.device_put(
            _build(False, jnp.float32, t[:T_cpu], y[:T_cpu], None), cpu
        )
        step_cpu = jax.jit(lambda model: model.step_with_elbo(0.5))
        mc2, ec = step_cpu(mc)
        _ = float(ec)
        t0 = time.perf_counter()
        for _ in range(3):
            mc2, ec = step_cpu(mc2)
        _ = float(ec)
        cpu_step_s = (time.perf_counter() - t0) / 3
    cpu_steps_per_sec = T_cpu / cpu_step_s

    print(
        json.dumps(
            {
                "metric": "parallel-scan KF+RTS+ELBO+natgrad steps/sec "
                          "(T=100k CVI Poisson state-space GP, TPU fp32)",
                "value": round(steps_per_sec, 1),
                "unit": "steps/sec",
                "vs_baseline": round(steps_per_sec / cpu_steps_per_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
