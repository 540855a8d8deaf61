"""Zoo: state-space multi-output (LMC over Markov latents).

The reference realises LMC as a prior-DAG transform over SDE latents
(`transforms/multi_output.py:206` LMC, used by its sde model zoo); the
batch-path counterpart here is `kernels.multi_output.LMC`. This recipe is
the O(T) state-space form: L independent Markov latents stack
block-diagonally and the P outputs are mixing rows of the observation
matrix (`transforms.MixedValueHead`) — the observed marginal is identical
(Cov(g_p, g_q) = Σ_l W_pl W_ql k_l), gated against the batch LMC in
`tests/test_svgp_lmc.py`.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..kernels.markov import StackedMarkov
from ..likelihoods.gaussian import (
    BlockDiagonalGaussian,
    Gaussian,
    IndependentGaussian,
)
from ..models import CVIGP
from ..models.ssgp import StateSpaceGP
from ..transforms.operators import MixedValueHead, StateObservation
from ..utils.params import param, positive_param

__all__ = ["lmc_markov_gp"]


def lmc_markov_gp(
    t,
    Y,
    latents,
    mixing=None,
    noise: float = 0.1,
    likelihood=None,
    dtype=jnp.float64,
    parallel: bool = False,
    sqrt: bool = False,
    chunk_size=None,
    cvi: bool = False,
):
    """State-space LMC: P observed outputs = W @ (L independent Markov GPs).

    t [T] sorted times; Y [T, P] (NaN = missing); `latents` a list of Markov
    kernels. `mixing` is anything `MixedValueHead` accepts ([P, L] array,
    Param, or a `kernels.multi_output` mixing object — UnitLowerMixing /
    CorrelationMixing for the reference's LMC_LDL / LMC_DRD variants);
    None = trainable W initialised to eye(P, L). A non-Gaussian
    `likelihood` (or `cvi=True`) returns the CVI model.
    """
    t = jnp.asarray(t, dtype)
    Y = jnp.asarray(Y, dtype)
    P, L = Y.shape[1], len(latents)
    if mixing is None:
        mixing = param(jnp.eye(P, L, dtype=dtype))
    kern = StackedMarkov(parts=list(latents))
    obs = StateObservation(heads=[MixedValueHead(W=mixing)])
    lik = likelihood or IndependentGaussian(
        variances=[positive_param(jnp.asarray(noise, dtype))
                   for _ in range(P)]
    )
    conjugate = isinstance(
        lik, (Gaussian, IndependentGaussian, BlockDiagonalGaussian)
    )
    if cvi or not conjugate:
        return CVIGP.init(
            t, Y, kern, lik, observation=obs, parallel=parallel, sqrt=sqrt,
            chunk_size=chunk_size,
        )
    return StateSpaceGP(
        t=t, Y=Y, kernel=kern, likelihood=lik, observation=obs,
        parallel=parallel, sqrt=sqrt, chunk_size=chunk_size,
    )
