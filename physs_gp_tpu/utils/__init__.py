from .params import (
    Param,
    identity,
    param,
    positive,
    positive_param,
    tril_param,
    tril_value,
)
from .struct import field, is_module, module, replace, static
