from .grids import merge_time_grids, sort_time_series
from .transformed import AffineTransform, BoxCoxTransform, LogTransform, TransformedData
