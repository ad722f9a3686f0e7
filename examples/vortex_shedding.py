"""Vortex shedding behind a cylinder — the reference's movie workload.

Script version of ``docs/cs205_movie.ipynb`` / ``docs/vortex_sheet_movie.
ipynb``: flow past a cylinder at moderate Reynolds number, frames rendered
on-device (``utils.render.FieldAnimator``) and written as PNGs.

Usage: python examples/vortex_shedding.py [outdir] [num_frames]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import os
import sys

import numpy as np

from lb2d_tpu.models import PipeFlowCylinder
from lb2d_tpu.utils.render import FieldAnimator


def main(outdir="vortex_frames", num_frames=20):
    os.makedirs(outdir, exist_ok=True)
    # cylinder of radius D/15 in a 3D-long pipe (vortex_sheet_movie.ipynb
    # uses r = D/25 at N=125; smaller here for a quick demo)
    D = 1.5
    sim = PipeFlowCylinder(
        cylinder_center=(0.75, 0.75), cylinder_radius=D / 15,
        diameter=D, rho=10.0, viscosity=0.25, pressure_grad=-10.0,
        pipe_length=3 * D, N=40)
    print(f"grid {sim.nx}x{sim.ny}, omega={sim.omega:.4f}, "
          f"backend={sim.backend}")
    anim = FieldAnimator(sim, field="u", steps_per_frame=400)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for k in range(int(num_frames)):
        frame = anim.frame()
        plt.imsave(os.path.join(outdir, f"frame_{k:04d}.png"), frame)
    print(f"wrote {num_frames} frames to {outdir}/ "
          f"({sim.steps_taken} steps, {sim.last_mlups or 0:.0f} MLUPS last)")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(*([args[0]] if args else []),
         **({"num_frames": int(args[1])} if len(args) > 1 else {}))
