"""Shared experiment harness: timing, metrics, result dumps.

Mirrors the reference's experiment procedure (`experiments/ac/models/
m_pigp.py:306,389-431`): wall-clock `training_time` around the full training
loop (jit compile included, as the reference measures), RMSE + NLPD metrics,
and a results file per run (JSON here instead of pickle — same content,
humanly diffable).

Every driver supports `--quick` (small sizes, CI-scale) and `--out DIR`.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import time

import numpy as np

__all__ = ["parse_args", "Timer", "rmse", "dump_results"]


def parse_args(name: str, extra=None):
    p = argparse.ArgumentParser(name)
    p.add_argument("--quick", action="store_true", help="small CI-scale run")
    p.add_argument("--out", default="results", help="results directory")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend + fp64 (JAX_PLATFORMS env alone is NOT "
        "honored once the TPU plugin is on the path; must be the config "
        "update, before any jax op)",
    )
    if extra:
        extra(p)
    args = p.parse_args()
    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    return args


class Timer:
    """`training_time = end - start` around the whole loop (ref
    `trainers/trainer.py:261-288`)."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.t0


def rmse(pred, truth) -> float:
    pred, truth = np.asarray(pred).ravel(), np.asarray(truth).ravel()
    ok = np.isfinite(truth)
    return float(np.sqrt(np.mean((pred[ok] - truth[ok]) ** 2)))


def dump_results(out_dir: str, name: str, results: dict) -> pathlib.Path:
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / f"{name}.json"
    with open(path, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(f"[{name}] metrics: {json.dumps(results.get('metrics', {}), default=float)}")
    print(f"[{name}] saved -> {path}")
    return path
