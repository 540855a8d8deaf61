from .ssgp import GaussianMoments, StateSpaceGP
