"""Karman vortex street behind a cylinder — the reference's movie
workload at a Reynolds number that actually sheds.

The cs205/vortex_sheet movies (``docs/cs205_movie.ipynb``) drive an
obstacle flow with a velocity inlet in lattice units. This script
reproduces that setup with direct control of the Reynolds number:
``Re = u_w * d / nu_lb`` with the cylinder diameter ``d`` in lattice
cells, so ``Re ~ 150`` gives periodic shedding (onset ~47 unbounded).
The cylinder sits slightly off the channel centerline — the standard
symmetry-breaking perturbation that lets the street develop in a few
convective times instead of waiting for fp32 noise to grow.

Usage: python examples/karman_street.py [outdir] [num_frames] [Re]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lb2d_tpu.models.lattice_units import PipeFlowVelocityInlet
from lb2d_tpu.utils.render import FieldAnimator


def build(Re=150.0, lx=1000, ly=300, u_w=0.1, d=40):
    # the lattice-units classes use the reference's inclusive grids:
    # (ly+1) x (lx+1) nodes
    yy, xx = np.mgrid[0:ly + 1, 0:lx + 1]
    cy, cx = ly // 2 - 8, lx // 5          # slightly below the centerline
    mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= (d / 2) ** 2
    nu_lb = u_w * d / Re
    omega = 1.0 / (0.5 + 3.0 * nu_lb)
    return PipeFlowVelocityInlet(u_w=u_w, omega=omega, lx=lx, ly=ly,
                                 obstacle_mask=mask)


def main(outdir="karman_frames", num_frames=80, Re=150.0):
    os.makedirs(outdir, exist_ok=True)
    sim = build(Re=float(Re))
    print(f"grid {sim.nx}x{sim.ny}, omega={sim.omega:.4f}, Re={Re}, "
          f"backend={sim.backend}")
    anim = FieldAnimator(sim, field="u", steps_per_frame=500)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for k in range(int(num_frames)):
        frame = anim.frame()
        plt.imsave(os.path.join(outdir, f"frame_{k:04d}.png"), frame)
    print(f"wrote {num_frames} frames to {outdir}/ "
          f"({sim.steps_taken} steps)")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*([a[0]] if a else []),
         **({"num_frames": int(a[1])} if len(a) > 1 else {}),
         **({"Re": float(a[2])} if len(a) > 2 else {}))
