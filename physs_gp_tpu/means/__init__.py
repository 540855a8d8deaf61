from .mean import ConstantMean, FunctionMean, LinearMean, ZeroMean
