from .metrics import confidence_interval, gaussian_nlpd, nlpd_quadrature, rmse
