from .diffusion import (
    AdvectionDiffusion,
    Diffusion,
    ReactionAdvectionDiffusion,
    ReactionAdvectionDiffusionStochastic,
    ReactionDiffusion,
)
from .pipe_flow import (
    PipeFlow,
    PipeFlowCylinder,
    PipeFlowObstacles,
    PipeFlowVelocityInlet,
    disk_mask,
)

__all__ = [
    "PipeFlow",
    "PipeFlowCylinder",
    "PipeFlowObstacles",
    "PipeFlowVelocityInlet",
    "disk_mask",
    "Diffusion",
    "AdvectionDiffusion",
    "ReactionDiffusion",
    "ReactionAdvectionDiffusion",
    "ReactionAdvectionDiffusionStochastic",
]
