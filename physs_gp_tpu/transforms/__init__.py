from .operators import (
    DerivativeHead,
    LinearOperatorHead,
    StateObservation,
    ValueHead,
    derivative_row,
)
