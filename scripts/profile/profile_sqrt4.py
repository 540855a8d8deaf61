"""Sqrt full-step timing vs PHYSS_SCAN_BLOCKS (in-graph K-loop).

Blocks is read at trace time, so pass it as argv and run once per setting:

    python -u scripts/profile/profile_sqrt4.py 256
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

if len(sys.argv) > 1:
    os.environ["PHYSS_SCAN_BLOCKS"] = sys.argv[1]

import jax

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
    from physs_gp_tpu.utils.struct import replace
    from physs_gp_tpu.zoo.bench_configs import build_config5

    m = build_config5(T, CHUNK)

    def loop(mm):
        def body(carry, _):
            return carry.step_with_elbo(0.5)[0], None

        out, _ = jax.lax.scan(body, mm, None, length=K)
        return out

    blocks = os.environ.get("PHYSS_SCAN_BLOCKS", "256")
    for name, mdl in [("cov ", m), ("sqrt", replace(m, sqrt=True))]:
        dt = chain_time(loop, mdl)
        print(
            f"blocks={blocks} {name} full step: {dt * 1e3:8.1f} ms "
            f"({T / dt / 1e3:7.1f} k steps/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
