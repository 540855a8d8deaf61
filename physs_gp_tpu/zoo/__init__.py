from .physics import monotonic_cvi_gp, nonlinear_ode_cvi_gp, ode_gp
