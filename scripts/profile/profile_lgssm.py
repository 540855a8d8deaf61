"""Attribute the 86 ms config-5 lgssm-build bucket (profile_c5f round 3).

Probes: transition/noise closed forms, gather-based kron_lift vs a
tile-based (broadcast+reshape) formulation, H build.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile/profile_lgssm.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import T5, build_config5


def timeit(f, *args, reps=10):
    f = jax.jit(f)
    c = float(f(jnp.asarray(0.0, jnp.float32), *args))
    t0 = time.perf_counter()
    cc = jnp.asarray(c, jnp.float32) * 1e-30
    for _ in range(reps):
        cc = f(cc, *args) * 1e-30
    _ = float(cc)
    return (time.perf_counter() - t0) / reps


def kron_lift_tile(B, C):
    """kron(B, C) via tile/repeat (broadcast+reshape lowering, no gather)."""
    m = B.shape[-1]
    n = C.shape[-1]
    Bg = jnp.repeat(jnp.repeat(B, n, axis=-2), n, axis=-1)  # [mn, mn]
    Cg = jnp.tile(C, (1, m, m))  # [T, mn, mn]
    return Bg[None] * Cg


def main():
    from physs_gp_tpu.kernels.markov import noise_matrix, to_ss, transition_matrix
    from physs_gp_tpu.ops.matrix import kron_lift

    m = build_config5(T5, 20_000)
    kern = m.kernel
    t = m.t

    def p_dt_trans(c):
        dt = jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.diff(t)]) + c * 1e-30
        A_t = transition_matrix(kern.k_time, dt)
        return A_t.sum()

    def p_dt_noise(c):
        dt = jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.diff(t)]) + c * 1e-30
        Q_t = noise_matrix(kern.k_time, dt)
        return Q_t.sum()

    dt0 = jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.diff(t)])
    A_t = jax.jit(lambda: transition_matrix(kern.k_time, dt0))()
    Ks = jax.jit(lambda: kern.Kzz())()
    eye_s = jnp.eye(kern.n_sites, dtype=A_t.dtype)

    def p_lift_gather(c, A_t, eye_s):
        return kron_lift(eye_s, A_t * (1 + c * 1e-30)).sum()

    def p_lift_tile(c, A_t, eye_s):
        return kron_lift_tile(eye_s, A_t * (1 + c * 1e-30)).sum()

    def p_lift_gather_ks(c, A_t, Ks):
        return kron_lift(Ks, A_t * (1 + c * 1e-30)).sum()

    def p_lift_tile_ks(c, A_t, Ks):
        return kron_lift_tile(Ks, A_t * (1 + c * 1e-30)).sum()

    def p_full_lgssm(c):
        from physs_gp_tpu.ops.lgssm import build_lgssm

        ssm = build_lgssm(kern, t + c * 1e-30)
        return ssm.A.sum() + ssm.Q.sum() + ssm.H.sum() + ssm.P0.sum()

    def p_H(c):
        H = m.observation.H(kern)
        return H.sum() * (1 + c * 1e-30)

    print(f"trans closed form  {timeit(p_dt_trans)*1e3:8.2f} ms", flush=True)
    print(f"noise closed form  {timeit(p_dt_noise)*1e3:8.2f} ms", flush=True)
    print(f"lift gather (eye)  {timeit(p_lift_gather, A_t, eye_s)*1e3:8.2f} ms",
          flush=True)
    print(f"lift tile   (eye)  {timeit(p_lift_tile, A_t, eye_s)*1e3:8.2f} ms",
          flush=True)
    print(f"lift gather (Ks)   {timeit(p_lift_gather_ks, A_t, Ks)*1e3:8.2f} ms",
          flush=True)
    print(f"lift tile   (Ks)   {timeit(p_lift_tile_ks, A_t, Ks)*1e3:8.2f} ms",
          flush=True)
    print(f"obs H build        {timeit(p_H)*1e3:8.2f} ms", flush=True)
    print(f"full to_lgssm      {timeit(p_full_lgssm)*1e3:8.2f} ms", flush=True)

    # equivalence
    g = kron_lift(Ks, A_t[:100])
    ti = kron_lift_tile(Ks, A_t[:100])
    err = float(jnp.max(jnp.abs(g - ti)))
    print(f"gather vs tile max abs diff: {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
