from .ssgp import GaussianMoments, StateSpaceGP
from .cvi_gp import CVIGP
from .stgp import SpatioTemporalGP
from .batch_gp import BatchGP
from .svgp import SVGP
from .ekf_gp import NonlinearSSGP
from .gprn import GPRN
from .wrappers import LatentPredictor, MultiObjectiveModel
from .lvgp import LatentVariableGP
from .streaming import StreamingGP, StreamingCVI, StreamState, SegmentResult
from .vecchia import VecchiaGP
