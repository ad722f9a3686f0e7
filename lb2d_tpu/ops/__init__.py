from .boundary import (
    bounce_back_obstacle,
    zou_he_pressure_bcs,
    zou_he_pressure_bcs_incompressible,
    zou_he_velocity_bcs,
)
from .collide import bgk
from .equilibrium import feq_incompressible, feq_linear, feq_poisson, feq_quadratic
from .moments import (
    density,
    hydro_compressible,
    hydro_incompressible,
    momentum,
    rho_poisson,
)
from .stream import stream

__all__ = [
    "stream", "bgk",
    "feq_quadratic", "feq_incompressible", "feq_linear", "feq_poisson",
    "density", "momentum", "hydro_compressible", "hydro_incompressible",
    "rho_poisson",
    "zou_he_pressure_bcs", "zou_he_pressure_bcs_incompressible",
    "zou_he_velocity_bcs", "bounce_back_obstacle",
]
