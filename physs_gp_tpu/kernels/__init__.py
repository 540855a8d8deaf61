from .base import (
    Bias,
    Kernel,
    LinearKernel,
    ProductKernel,
    StationaryKernel,
    SumKernel,
    WhiteNoise,
)
from .markov import MarkovKernel, StateSpace, to_ss, transition_matrix
from .matern import Matern, Matern12, Matern32, Matern52, Matern72
from .rbf import RBF
