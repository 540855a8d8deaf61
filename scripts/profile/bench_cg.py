"""BatchGP solver="cg" vs solver="cholesky" at design scale (VERDICT r4 #4).

Measures, per n ∈ {2k, 4k, 8k, 16k} on the live TPU chip (fp32):
  - lml wall time (in-graph K-loop, chained carry folded into X so XLA
    cannot hoist the body; host float() fetch — CLAUDE.md rule 8)
  - lml + grad wall time (the training-step cost)
  - XLA memory_analysis peak temp bytes of the compiled lml
  - lml agreement CG vs Cholesky (relative)

Writes results/cg_crossover.json and prints the table.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile/bench_cg.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

K_LOOP = 4


def _model(n, solver):
    from physs_gp_tpu.kernels.rbf import RBF
    from physs_gp_tpu.likelihoods.gaussian import Gaussian
    from physs_gp_tpu.models.batch_gp import BatchGP
    from physs_gp_tpu.utils.params import positive_param

    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    f = np.sin(X[:, 0]) * np.cos(1.3 * X[:, 1])
    Y = (f + 0.1 * rng.normal(size=n)).astype(np.float32)[:, None]
    return BatchGP(
        X=jnp.asarray(X), Y=jnp.asarray(Y),
        kernel=RBF(lengthscales=positive_param(jnp.asarray([0.7, 0.7],
                                                           jnp.float32)),
                   variance=positive_param(jnp.asarray(1.0, jnp.float32))),
        likelihood=Gaussian(variance=positive_param(
            jnp.asarray(0.01, jnp.float32))),
        solver=solver,
    )


def _k_loop(fn):
    """m -> scalar running fn K_LOOP times in-graph, each iteration chained
    through the carry (folded into X) so XLA cannot hoist the body."""
    from physs_gp_tpu.utils.struct import replace

    def looped(m):
        def body(c, _):
            mm = replace(m, X=m.X + c)
            return fn(mm) * jnp.asarray(1e-30, jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), None,
                            length=K_LOOP)
        return c
    return looped


def _time(fn, m, reps=3):
    from physs_gp_tpu.utils.struct import replace

    f = jax.jit(_k_loop(fn))
    c = float(f(m))
    t0 = time.perf_counter()
    for _ in range(reps):
        m = replace(m, X=m.X + jnp.asarray(1e-30 * c, jnp.float32))
        c = float(f(m))
    return (time.perf_counter() - t0) / (reps * K_LOOP)


def _mem(fn, m):
    try:
        comp = jax.jit(fn).lower(m).compile()
        ma = comp.memory_analysis()
        return float(getattr(ma, "temp_size_in_bytes", 0))
    except Exception:
        return None


def main():
    rows = []
    # 16384 crashes the TPU relay worker (the Cholesky arm's ~4 GB peak-temp
    # grad graph; observed "TPU worker process crashed", 2026-08-20) — the
    # one-chip ceiling for this comparison is 8192
    for n in (2048, 4096, 8192):
        row = {"n": n}
        lmls = {}
        for solver in ("cholesky", "cg"):
            from physs_gp_tpu.utils.struct import replace

            m = _model(n, solver)

            def lml_fn(mm):
                return mm.log_marginal_likelihood()

            def grad_fn(mm):
                # fold the gradient into the output — returning only the
                # value lets XLA dead-code-eliminate the entire backward pass
                v, gr = jax.value_and_grad(
                    lambda x: replace(mm, X=x).log_marginal_likelihood()
                )(mm.X)
                return v + jnp.asarray(1e-30, v.dtype) * jnp.sum(gr)

            lmls[solver] = float(jax.jit(lml_fn)(m))
            row[f"lml_{solver}"] = lmls[solver]
            row[f"t_lml_{solver}_ms"] = round(_time(lml_fn, m) * 1e3, 2)
            row[f"t_lml_grad_{solver}_ms"] = round(
                _time(grad_fn, m) * 1e3, 2)
            mem = _mem(lml_fn, m)
            if mem is not None:
                row[f"peak_temp_{solver}_mb"] = round(mem / 2 ** 20, 1)
        row["lml_rel_diff"] = abs(lmls["cg"] - lmls["cholesky"]) / max(
            1.0, abs(lmls["cholesky"]))
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open("results/cg_crossover.json", "w") as f:
        json.dump({"rows": rows, "k_loop": K_LOOP,
                   "note": "TPU fp32; times are per-lml-call from an "
                           "in-graph K-loop; slq_probes=32, slq_iters=48, "
                           "cg_tol=1e-6"}, f, indent=2)
    print("saved -> results/cg_crossover.json")


if __name__ == "__main__":
    main()
