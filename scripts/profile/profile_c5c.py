"""Isolate the inner-scan and per-step-lml costs of the config-5 filter, and
A/B a blocked two-level scan prototype against jax.lax.associative_scan.

The lane-batched Pallas linalg gates on batch >= 256
(`use_pallas_linalg`), so every associative_scan level below 256 elements
falls back to XLA's slow batched-dot path. The blocked scan keeps EVERY
combine at batch >= n_blocks:

  [n] -> pad -> [L, B] ; sequential lax.scan over L (B-wide combines)
       -> associative_scan over the B block totals (small, slow path ok)
       -> one distribute combine at full width.

Work: 2n + O(B log B) combines (vs ~1.5n for associative_scan), all wide.

Run: PYTHONPATH=/root/repo python -u scripts/profile/profile_c5c.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import build_config5
from physs_gp_tpu.ops.kalman import observation_mask
from physs_gp_tpu.ops.lgssm import build_lgssm
from physs_gp_tpu.ops.parallel_kalman import (
    _FilterElems,
    _build_filter_elements,
    _filtering_operator,
    _per_step_lml,
)
from physs_gp_tpu.utils.struct import replace

CHUNK = 5000


def chain(m, c):
    return replace(
        m, sites=replace(m.sites, V=m.sites.V + jnp.asarray(1e-30, m.t.dtype) * c)
    )


def timeit(f, m, reps=8):
    f = jax.jit(f)
    c = f(m, jnp.asarray(0.0, m.t.dtype))
    c = float(c)
    t0 = time.perf_counter()
    cc = jnp.asarray(c, m.t.dtype) * 1e-30
    for _ in range(reps):
        cc = f(m, cc) * 1e-30
    _ = float(cc)
    return (time.perf_counter() - t0) / reps


def _inputs(mm):
    ssm = build_lgssm(mm.kernel, mm.t)
    ssm = ssm._replace(H=mm.observation.H(mm.kernel))
    Y, R = mm.sites.Y, mm.sites.V
    T = Y.shape[0]
    mask = observation_mask(Y, ssm.P0.dtype)
    H = jnp.broadcast_to(ssm.H, (T,) + ssm.H.shape[-2:])
    return ssm, H, R, Y, mask


def _one_chunk_elems(mm):
    ssm, H, R, Y, mask = _inputs(mm)
    sl = slice(0, CHUNK)
    return _build_filter_elements(
        ssm.A[sl], ssm.Q[sl], H[sl], R[sl], Y[sl], mask[sl], ssm.m0, ssm.P0
    )


def p_build1(m, c):
    e = _one_chunk_elems(chain(m, c))
    return sum(x.sum() for x in e)


def p_scan1(m, c):
    e = _one_chunk_elems(chain(m, c))
    s = jax.lax.associative_scan(_filtering_operator, e)
    return sum(x.sum() for x in s)


def _identity_elem(d, dtype, batch):
    eye = jnp.broadcast_to(jnp.eye(d, dtype=dtype), batch + (d, d))
    zmat = jnp.zeros(batch + (d, d), dtype)
    zvec = jnp.zeros(batch + (d,), dtype)
    return _FilterElems(A=eye, b=zvec, C=zmat, J=zmat, eta=zvec)


def blocked_scan(op, elems, ident_fn, n_blocks=256):
    """Inclusive scan, every combine at batch >= n_blocks (see module doc)."""
    leaves = jax.tree_util.tree_leaves(elems)
    n = leaves[0].shape[0]
    L = -(-n // n_blocks)
    pad = L * n_blocks - n
    if pad:
        idp = ident_fn((pad,))
        elems = jax.tree_util.tree_map(
            lambda x, i: jnp.concatenate([x, i]), elems, idp
        )
    # [L*B] -> [B, L] row-major puts consecutive time inside a block;
    # scan axis must be L with batch B: transpose to [L, B]
    blocked = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(
            x.reshape((n_blocks, L) + x.shape[1:]), 1, 0
        ),
        elems,
    )
    ident_b = ident_fn((n_blocks,))

    def body(carry, x):
        out = op(carry, x)
        return out, out

    _, intra = jax.lax.scan(body, ident_b, blocked)  # intra [L, B, ...]
    # per-block totals are the last intra row; exclusive block prefix from an
    # inclusive scan over them (small, slow path acceptable)
    block_tot = jax.tree_util.tree_map(lambda x: x[-1], intra)  # [B, ...]
    tot_scan = jax.lax.associative_scan(op, block_tot)  # inclusive [B, ...]
    prefix = jax.tree_util.tree_map(
        lambda ts, idb: jnp.concatenate([idb[:1], ts[:-1]]), tot_scan, ident_b
    )
    # distribute: out[l, b] = op(prefix[b], intra[l, b]) at full width
    flat_intra = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(x, 0, 1).reshape((n_blocks * L,) + x.shape[2:]),
        intra,
    )
    flat_prefix = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, L, axis=0), prefix
    )
    out = op(flat_prefix, flat_intra)
    return jax.tree_util.tree_map(lambda x: x[:n], out)


def p_blocked1(m, c):
    e = _one_chunk_elems(chain(m, c))
    d = e.A.shape[-1]
    dtype = e.A.dtype
    s = blocked_scan(
        _filtering_operator, e, lambda b: _identity_elem(d, dtype, b)
    )
    return sum(x.sum() for x in s)


def p_lml(m, c):
    mm = chain(m, c)
    ssm, H, R, Y, mask = _inputs(mm)
    T, d = Y.shape[0], ssm.m0.shape[-1]
    # fake filtered moments with the right shapes (chained via c)
    ms = jnp.broadcast_to(ssm.m0, (T, d)) + c * 1e-30
    Ps = jnp.broadcast_to(ssm.P0, (T, d, d))
    lmls = _per_step_lml(ssm.A, ssm.Q, H, R, Y, mask, ms, ssm.m0, ssm.P0, Ps)
    return lmls.sum()


def main():
    m = build_config5(100_000, CHUNK)
    # correctness of blocked_scan vs associative_scan (one chunk)
    e = _one_chunk_elems(m)
    ref = jax.jit(
        lambda ee: jax.lax.associative_scan(_filtering_operator, ee)
    )(e)
    d, dtype = e.A.shape[-1], e.A.dtype
    got = jax.jit(
        lambda ee: blocked_scan(
            _filtering_operator, ee, lambda b: _identity_elem(d, dtype, b)
        )
    )(e)
    import numpy as np

    err = max(
        float(jnp.max(jnp.abs(r - g)))
        for r, g in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(got))
    )
    print(f"blocked_scan max abs err vs associative_scan: {err:.3e}",
          flush=True)

    for name, fn in [
        ("build 1 chunk", p_build1),
        ("assoc-scan 1 chunk", p_scan1),
        ("blocked-scan 1 chunk", p_blocked1),
        ("per-step lml (full T)", p_lml),
    ]:
        t = timeit(fn, m)
        print(f"{name:24s} {t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
