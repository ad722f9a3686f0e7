from .lattice import D2Q9, D2Q25, Lattice
from .nondim import DiffusionUnits, FlowUnits, diffusive_scaling, omega_from_lb_visc

__all__ = [
    "D2Q9", "D2Q25", "Lattice",
    "FlowUnits", "DiffusionUnits", "diffusive_scaling", "omega_from_lb_visc",
]
