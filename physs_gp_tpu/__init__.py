"""physs_gp_tpu — TPU-native physics-informed variational state-space GPs.

A from-scratch JAX/XLA framework with the capabilities of the reference
`jonathanfrennert/physs_gp` (NeurIPS 2024 "Physics-Informed Variational
State-Space Gaussian Processes"), redesigned TPU-first: pytree modules + pure
functions, batched closed-form SDE discretisation, `lax.scan` /
`lax.associative_scan` Kalman filtering-smoothing, CVI natural-gradient site
updates, and `shard_map` time-axis sharding for multi-chip scaling.
"""

from . import approx, data, kernels, likelihoods, means, metrics, models, ops, parallel, trainers, transforms, utils, zoo

__version__ = "0.1.0"
