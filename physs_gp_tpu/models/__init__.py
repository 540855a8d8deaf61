from .ssgp import GaussianMoments, StateSpaceGP
from .cvi_gp import CVIGP
