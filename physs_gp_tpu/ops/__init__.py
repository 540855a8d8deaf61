from . import cg, ekf, gaussian, kalman, lgssm, matrix, parallel_kalman, parallel_sqrt_kalman, quadrature, runner, sqrt_kalman
