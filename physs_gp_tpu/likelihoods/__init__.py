from .gaussian import BlockDiagonalGaussian, Gaussian, IndependentGaussian, Likelihood, SharedVariance
from .nongaussian import Bernoulli, PerOutputLikelihood, Poisson, Probit, expected_log_lik
from .composite import CompositeLikelihood, NonlinearResidual
from .het_gaussian import HetGaussian
from .nongaussian import LossLikelihood, Power
from .dynamic_covariance import DynamicCovarianceGaussian, correlation_cholesky
