"""Attribute the config-5 CVI step time across its pipeline stages (TPU).

Measures CHAINED jitted probes (each probe consumes a scalar produced by the
previous call so XLA cannot overlap/cache across reps; CLAUDE.md rule 8) for
nested prefixes of the full step:

  elements   build_lgssm + observation H + site R        (element construction)
  filter     + parallel-scan Kalman filter               (forward combines)
  smoother   + parallel-scan RTS smoother                (backward combines)
  project    + H-projection to block moments (m, S)
  elbo       + ELL_data + ELL_sites                      (quadratic forms)
  step       + natural-gradient site update              (the full step)

Successive differences give per-stage cost. Run on the TPU:
    PYTHONPATH=/root/repo python -u scripts/profile/profile_c5.py [T] [reps]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import CHUNK, T5, build_config5


def _chain_model(m, c):
    """Make the model depend on carry scalar c without changing values
    (1e-30*c cannot be constant-folded away)."""
    from physs_gp_tpu.utils.struct import replace

    return replace(
        m, sites=replace(m.sites, V=m.sites.V + jnp.asarray(1e-30, m.t.dtype) * c)
    )


def make_probes():
    from physs_gp_tpu.ops.lgssm import build_lgssm, project_cov, project_mean
    from physs_gp_tpu.ops.runner import run_filter, run_filter_smoother

    def inputs(m):
        ssm = build_lgssm(m.kernel, m.t)
        if m.observation is not None:
            ssm = ssm._replace(H=m.observation.H(m.kernel))
        return ssm, m.sites.V, m.sites.Y

    def p_elements(m, c):
        ssm, R, Y = inputs(_chain_model(m, c))
        return ssm.A.sum() + ssm.Q.sum() + R.sum()

    def p_filter(m, c):
        ssm, R, Y = inputs(_chain_model(m, c))
        f, _ = run_filter(ssm, R, Y, parallel=True, chunk_size=m.chunk_size)
        # consume every output so XLA cannot dead-code-eliminate a stage
        return f.lml + f.ms.sum() + f.Ps.sum()

    def p_smoother(m, c):
        ssm, R, Y = inputs(_chain_model(m, c))
        f, s = run_filter_smoother(
            ssm, R, Y, parallel=True, chunk_size=m.chunk_size
        )
        # sum ALL smoother outputs: reducing only ms lets XLA DCE the whole
        # covariance combine and mis-attributes it to the next stage
        return f.lml + s.ms.sum() + s.Ps.sum()

    def p_project(m, c):
        ssm, R, Y = inputs(_chain_model(m, c))
        f, s = run_filter_smoother(
            ssm, R, Y, parallel=True, chunk_size=m.chunk_size
        )
        mm = project_mean(ssm.H, s.ms)
        S = project_cov(ssm.H, s.Ps)
        return f.lml + s.ms.sum() + s.Ps.sum() + mm.sum() + S.sum()

    def p_elbo(m, c):
        return _chain_model(m, c).elbo()

    def p_step(m, c):
        m2, e = _chain_model(m, c).step_with_elbo(0.5)
        return e + m2.sites.V.sum() * 1e-30

    return {
        "elements": p_elements,
        "filter": p_filter,
        "smoother": p_smoother,
        "project": p_project,
        "elbo": p_elbo,
        "step": p_step,
    }


def time_probe(fn, m, reps):
    f = jax.jit(fn)
    c = jnp.asarray(0.0, m.t.dtype)
    c = f(m, c)
    c = float(c)  # host sync
    t0 = time.perf_counter()
    cc = jnp.asarray(c, m.t.dtype) * 1e-30
    for _ in range(reps):
        cc = f(m, cc) * 1e-30
    _ = float(cc)
    return (time.perf_counter() - t0) / reps


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else T5
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    m = build_config5(T, CHUNK)
    probes = make_probes()
    out = {}
    for name, fn in probes.items():
        out[name] = time_probe(fn, m, reps)
        print(f"{name:10s} {out[name]*1e3:9.2f} ms", flush=True)
    stages = list(probes)
    print("\nper-stage increments:")
    prev = 0.0
    for name in stages:
        inc = out[name] - prev
        print(f"  +{name:10s} {inc*1e3:9.2f} ms")
        prev = out[name]
    print(json.dumps({k: round(v * 1e3, 2) for k, v in out.items()}))


if __name__ == "__main__":
    main()
