"""Per-stage timing of the config-5 CVI step, covariance vs square-root form.

Attributes the sqrt tax (VERDICT r4 next #5): times NESTED PREFIXES of the
step as in-graph K-loops (chained carry folded into sites.V so XLA cannot
hoist the body; one host fetch at the end — CLAUDE.md rule 8), then reports
per-stage differences:

  A  filter            run_filter (surrogate lml pass only)
  B  filter+smoother   run_filter_smoother (adds distribute + smoother)
  C  surrogate         + H-projections (m, S)  == CVIGP._surrogate_pass
  D  elbo              + ELL(data) + ELL(sites), forward only
  E  full step         step_with_elbo (adds natgrad update + value path)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile/profile_stages.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

T = 100_000
CHUNK = 20_000
K = 3


def main():
    from physs_gp_tpu.ops.lgssm import build_lgssm, project_mean, \
        project_cov, project_cov_factor
    from physs_gp_tpu.ops.runner import run_filter, run_filter_smoother
    from physs_gp_tpu.utils.struct import replace
    from physs_gp_tpu.zoo.bench_configs import build_config5

    m0 = build_config5(T, CHUNK)

    def ssm_of(mm):
        ssm = build_lgssm(mm.kernel, mm.t)
        return ssm._replace(H=mm.observation.H(mm.kernel))

    def chain(mm, c):
        return replace(
            mm, sites=replace(mm.sites,
                              V=mm.sites.V + jnp.asarray(1e-30, mm.t.dtype) * c)
        )

    def stage_A(mm):
        ssm = ssm_of(mm)
        f, _aux = run_filter(ssm, mm.sites.V, mm.sites.Y,
                             parallel=mm.parallel, sqrt=mm.sqrt,
                             chunk_size=mm.chunk_size)
        return f.lml

    def stage_B(mm):
        ssm = ssm_of(mm)
        f, s = run_filter_smoother(ssm, mm.sites.V, mm.sites.Y,
                                   parallel=mm.parallel, sqrt=mm.sqrt,
                                   chunk_size=mm.chunk_size)
        tail = s.Ls if s.Ls is not None else s.Ps
        return f.lml + 1e-30 * (jnp.sum(s.ms) + jnp.sum(tail))

    def stage_C(mm):
        ssm = ssm_of(mm)
        f, s = run_filter_smoother(ssm, mm.sites.V, mm.sites.Y,
                                   parallel=mm.parallel, sqrt=mm.sqrt,
                                   chunk_size=mm.chunk_size)
        mhead = project_mean(ssm.H, s.ms)
        S = (project_cov_factor(ssm.H, s.Ls) if s.Ls is not None
             else project_cov(ssm.H, s.Ps))
        return f.lml + 1e-30 * (jnp.sum(mhead) + jnp.sum(S))

    def stage_D(mm):
        return mm.elbo()

    def stage_E(mm):
        mm2, e = mm.step_with_elbo(0.5)
        return e + 1e-30 * jnp.sum(mm2.sites.Y)

    def k_loop(stage):
        def fn(mm):
            def body(c, _):
                return stage(chain(mm, c)) * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.asarray(0.0, mm.t.dtype), None,
                                length=K)
            return c
        return fn

    def timeit(stage, mm, reps=3):
        f = jax.jit(k_loop(stage))
        c = float(f(mm))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            # chain reps through the model pytree would retrace; chain via
            # the scalar instead: fold the previous value into sites.V once
            mm = replace(mm, sites=replace(
                mm.sites, V=mm.sites.V + jnp.asarray(1e-30 * c, mm.t.dtype)))
            c = float(f(mm))
        return (time.perf_counter() - t0) / (reps * K)

    stages = [("A filter", stage_A), ("B +smoother", stage_B),
              ("C +project", stage_C), ("D elbo fwd", stage_D),
              ("E full step", stage_E)]
    results = {}
    for form in ("cov", "sqrt"):
        mm = replace(m0, sqrt=(form == "sqrt"))
        prev = 0.0
        for name, fn in stages:
            dt = timeit(fn, mm)
            results[(form, name)] = dt
            print(f"{form:4s} {name:12s} {dt * 1e3:8.1f} ms "
                  f"(+{(dt - prev) * 1e3:7.1f} ms)", flush=True)
            prev = dt
    print("\nstage deltas (sqrt - cov), ms:")
    table = []
    prev_c = prev_s = 0.0
    for name, _ in stages:
        dc = results[("cov", name)] - prev_c
        ds = results[("sqrt", name)] - prev_s
        prev_c, prev_s = results[("cov", name)], results[("sqrt", name)]
        ratio = ds / dc if dc > 0 else float("inf")
        print(f"  {name:12s} cov {dc * 1e3:7.1f}  sqrt {ds * 1e3:7.1f}  "
              f"x{ratio:4.2f}")
        table.append({"stage": name, "cov_ms": round(dc * 1e3, 1),
                      "sqrt_ms": round(ds * 1e3, 1),
                      "ratio": round(ratio, 2) if dc > 0 else None})
    out = {"T": T, "chunk": CHUNK, "k_loop": K,
           "cumulative_ms": {f"{form}:{name}": round(results[(form, name)]
                                                     * 1e3, 1)
                             for form in ("cov", "sqrt")
                             for name, _ in stages},
           "stage_deltas": table}
    with open("results/sqrt_stages.json", "w") as f:
        json.dump(out, f, indent=2)
    print("saved -> results/sqrt_stages.json")


if __name__ == "__main__":
    main()
