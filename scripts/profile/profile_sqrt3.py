"""Sqrt-filter sub-stage attribution: elements build vs scan vs per-step lml.

Same in-graph K-loop methodology as profile_sqrt2.py (single-dispatch
timings carry the ~8 ms relay floor). Run WITHOUT overriding PYTHONPATH
(sitecustomize must register the axon plugin):

    python -u scripts/profile/profile_sqrt3.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

T = 100_000
CHUNK = 20_000
K = 2


def chain_time(fn, m, n=2):
    step = jax.jit(fn)
    m2 = step(m)
    _ = float(m2.sites.Y[0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        m2 = step(m2)
    _ = float(m2.sites.Y[0, 0])
    return (time.perf_counter() - t0) / (n * K)


def main():
    from physs_gp_tpu.ops.lgssm import build_lgssm
    from physs_gp_tpu.ops.kalman import observation_mask
    from physs_gp_tpu.ops import parallel_sqrt_kalman as psk
    from physs_gp_tpu.utils.struct import replace
    from physs_gp_tpu.zoo.bench_configs import build_config5

    m = build_config5(T, CHUNK)

    def loop(stage):
        def run(mm):
            def body(carry, _):
                return stage(carry), None

            out, _ = jax.lax.scan(body, mm, None, length=K)
            return out

        return run

    def fold(mm, x):
        return replace(mm, sites=replace(mm.sites, Y=mm.sites.Y + 1e-30 * x))

    def parts_of(mm):
        ssm = build_lgssm(mm.kernel, mm.t + 1e-30 * mm.sites.Y[0, 0])
        if mm.observation is not None:
            ssm = ssm._replace(H=mm.observation.H(mm.kernel))
        Y = mm.sites.Y
        mask = observation_mask(Y, ssm.P0.dtype)
        Ht = jnp.broadcast_to(ssm.H, (T,) + ssm.H.shape[-2:])
        from physs_gp_tpu.ops.matrix import safe_cholesky_rel
        from physs_gp_tpu.ops.runner import _mask_decoupled_R

        Qs = safe_cholesky_rel(ssm.Q)
        Rs = safe_cholesky_rel(_mask_decoupled_R(mm.sites.V, Y))
        U0 = safe_cholesky_rel(ssm.P0)
        return ssm, Y, mask, Ht, Qs, Rs, U0

    def s_factors(mm):
        ssm, Y, mask, Ht, Qs, Rs, U0 = parts_of(mm)
        return fold(mm, jnp.sum(Qs[-1]) + jnp.sum(Rs[-1]) + jnp.sum(U0))

    def s_elements(mm):
        ssm, Y, mask, Ht, Qs, Rs, U0 = parts_of(mm)
        e = psk._build_sqrt_elements(ssm.A, Qs, Ht, Rs, Y, mask, ssm.m0, U0)
        return fold(mm, jnp.sum(e.b[-1]) + jnp.sum(e.U[-1]) + jnp.sum(e.Z[-1]))

    def s_lml(mm):
        ssm, Y, mask, Ht, Qs, Rs, U0 = parts_of(mm)
        # stand-in filtered moments with the right shapes/layout
        ms = jnp.einsum("tpd,tp->td", Ht, jnp.nan_to_num(Y))
        Us = jnp.broadcast_to(U0, (T,) + U0.shape)
        lmls, Up = psk._per_step_lml_sqrt(
            ssm.A, Qs, Ht, Rs, Y, mask, ms, ssm.m0, U0, Us
        )
        return fold(mm, jnp.sum(lmls) + jnp.sum(Up[-1]))

    def s_filter(mm):
        from physs_gp_tpu.ops.runner import run_filter

        ssm, Y, mask, Ht, Qs, Rs, U0 = parts_of(mm)
        fr, _ = run_filter(ssm, mm.sites.V, Y, parallel=True, sqrt=True,
                           chunk_size=mm.chunk_size)
        return fold(mm, fr.lml + jnp.sum(fr.ms[-1]))

    for name, fn in [
        ("sqrt factor prep (Q,R,P0)", s_factors),
        ("sqrt elements (+prep)    ", s_elements),
        ("sqrt per-step lml (+prep)", s_lml),
        ("sqrt filter full         ", s_filter),
    ]:
        dt = chain_time(loop(fn), m)
        print(f"{name}: {dt * 1e3:8.1f} ms  ({T / dt / 1e3:7.1f} k steps/s)",
              flush=True)


if __name__ == "__main__":
    main()
