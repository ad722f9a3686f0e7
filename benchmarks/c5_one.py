"""Config-5 single-variant measurement (precision, stale_force from argv)."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from lb2d_tpu.models.multicomponent import Fluid, SimulationRunner
prec = sys.argv[1]; stale = None if sys.argv[2] == "none" else int(sys.argv[2])
n = int(sys.argv[3])
size = 8192
sim = SimulationRunner(nx=size, ny=size, L_lb=size, T_lb=1.0,
                       num_populations=2, porous=True, stale_force=stale)
for i in range(2):
    sim.add_fluid(Fluid(sim, i, nu_e=1/6, epsilon=0.8, nu_fluid=1/6, K=10.0, Fe=0.1))
sim.complete_setup()
rng = np.random.RandomState(0)
base = 0.5 + 0.05 * rng.rand(size, size).astype(np.float32)
sim.fluid_list[0].initialize(base)
sim.fluid_list[1].initialize(1.0 - base)
sim.add_interaction_force(0, 1, G_int=1.5, potential="shan_chen", potential_parameters=[1.0])
sim.add_screened_poisson_force(0, 1, interaction_length=10.0, amplitude=1e-4, precision=prec)
sim.run(n, timed=True)
rates = []
for _ in range(5):
    sim.run(n, timed=True)
    rates.append(sim.last_mlups)
print(f"prec={prec} stale={stale} K={sim.steps_per_call}:",
      float(np.median(rates)), min(rates), max(rates), flush=True)
