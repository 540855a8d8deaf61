from .metrics import confidence_interval, gaussian_nlpd, nlpd_quadrature, rmse
from .metrics import response_curve, sample_confidence_intervals
