from .gaussian import BlockDiagonalGaussian, Gaussian, Likelihood
