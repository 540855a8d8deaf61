from .sharded import sharded_filter_smoother
