from . import gaussian, kalman, lgssm, matrix, parallel_kalman, quadrature
