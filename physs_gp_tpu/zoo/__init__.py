from .physics import allen_cahn_gp, monotonic_cvi_gp, nonlinear_ode_cvi_gp, ode_gp
from .spatio_temporal import (
    advection_diffusion_gp,
    scattered_st_gp,
    scattered_st_predict,
    sparse_st_gp,
    st_gp,
)
from .phi_ml import (
    curl_free_gp,
    helmholtz_gp,
    helmholtz_st_gp,
    helmholtz_st_predict,
    magnetic_field_gp,
    magnetic_field_predict,
)
from .diff import deriv_gp, deriv_sde_gp, deriv_st_gp, deriv_vgp, diff_orders
from .multi_output import lmc_markov_gp
from .dynamics import (
    dynamic_covariance_gp,
    latent_force_gp,
    lorenz_gp,
    lotka_volterra_gp,
)
