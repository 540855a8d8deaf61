from .operators import (
    DerivativeHead,
    ScatteredSpatialHead,
    LinearOperatorHead,
    OperatorTerm,
    SpatialHead,
    StateObservation,
    STOperatorHead,
    ValueHead,
    derivative_row,
    s_grad,
    s_identity,
    s_laplacian,
)
from .inputs import UncertainInputLikelihood
