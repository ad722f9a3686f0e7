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
]
