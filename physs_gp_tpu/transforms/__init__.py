from .operators import (
    DerivativeHead,
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
