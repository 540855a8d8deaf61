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
from .checkpoint import CheckpointCallback, load_model, save_model
from .training import apply_updates, trainable_mask, zero_untrainable
