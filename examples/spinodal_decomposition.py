"""Two-fluid Shan-Chen spinodal decomposition.

Script version of ``docs/multicomponent/multicomponent_test.ipynb``: two
mutually repelling fluids demix from a noisy mixture into domains.

Usage: python examples/spinodal_decomposition.py [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys

import numpy as np

from lb2d_tpu.models import Fluid, SimulationRunner


def main(out="spinodal.png"):
    n = 128
    sim = SimulationRunner(nx=n, ny=n, L_lb=n, num_populations=2,
                           porous=False)
    for i in range(2):
        sim.add_fluid(Fluid(sim, i, nu_e=1.0 / 6.0))
    sim.complete_setup()
    rng = np.random.RandomState(0)
    base = 0.5 + 0.05 * rng.rand(n, n)
    sim.fluid_list[0].initialize(base)
    sim.fluid_list[1].initialize(1.0 - base)
    sim.add_interaction_force(0, 1, G_int=1.8, potential="linear")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 4, figsize=(14, 3.5))
    for ax, steps in zip(axes, [0, 200, 800, 3000]):
        sim.run(steps - sim.steps_taken) if steps else None
        rho = sim.get_fields()["rho"][:, :, 0]
        ax.imshow(rho.T, cmap="RdBu", vmin=0, vmax=1.2)
        ax.set_title(f"step {steps}")
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
