from .diffusion import (
    AdvectionDiffusion,
    Diffusion,
    ReactionAdvectionDiffusion,
    ReactionAdvectionDiffusionStochastic,
    ReactionDiffusion,
)
from .lattice_units import (LatticePipeFlow,
                            LatticePipeFlowPeriodicBC,
                            PipeFlowVelocityInlet)
from .multicomponent import Fluid, SimulationRunner
from .multifield import Expansion, FisherExpansion
from .pipe_flow import (
    PipeFlow,
    PipeFlowCylinder,
    PipeFlowObstacles,
    disk_mask,
)
from .poisson import PoissonSolver
from .rocket_yeast import RocketYeast, RocketYeastForcesOnly
from .spectral import ScreenedPoisson, screened_poisson_solve
from .surfactant import ClumpySurfactantNutrientWave, SurfactantNutrientWave
from .waves import (
    NoisyAdvectedFisherWave,
    RepellingFisherWave,
    ScreenedFisherWave,
)

__all__ = [
    # flow family
    "PipeFlow", "PipeFlowCylinder", "PipeFlowObstacles",
    "PipeFlowVelocityInlet", "disk_mask", "LatticePipeFlow",
    "LatticePipeFlowPeriodicBC",
    # diffusion family
    "Diffusion", "AdvectionDiffusion", "ReactionDiffusion",
    "ReactionAdvectionDiffusion", "ReactionAdvectionDiffusionStochastic",
    # waves
    "NoisyAdvectedFisherWave", "ScreenedFisherWave", "RepellingFisherWave",
    # multifield
    "FisherExpansion", "Expansion",
    # surfactant / rocket yeast
    "SurfactantNutrientWave", "ClumpySurfactantNutrientWave",
    "RocketYeast", "RocketYeastForcesOnly",
    # solvers
    "PoissonSolver", "ScreenedPoisson", "screened_poisson_solve",
    # multicomponent engine
    "Fluid", "SimulationRunner",
]
