"""Sweep the resident kernel's step-unroll factor per grid size (TPU).

Usage: python benchmarks/sweep_resident_unroll.py "ny,nx,U [ny,nx,U ...]"
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def measure(ny, nx, U):
    from lb2d_tpu.models.pipe_flow import PipeFlow
    from lb2d_tpu.ops.fused import make_resident_pipe_step

    N = ny - 1
    sim = PipeFlow(diameter=1.5, rho=10.0, viscosity=5.0,
                   pressure_grad=-100.0, pipe_length=1.5 * (nx - 1.5) / N,
                   N=N, backend="xla")
    run_k = make_resident_pipe_step(
        ny=ny, nx=nx, omega=sim.omega, inlet_rho=sim.inlet_rho,
        outlet_rho=sim.outlet_rho, unroll=U)
    runj = jax.jit(run_k, donate_argnums=0)
    steps = 20000 if ny * nx <= 300000 else 4000
    f = runj(sim.state, jnp.int32(steps))
    float(jnp.sum(f[0, 0, :8]))
    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        f = runj(f, jnp.int32(steps))
        float(jnp.sum(f[0, 0, :8]))
        dt = time.perf_counter() - t0
        rates.append(ny * nx * steps / dt / 1e6)
    rates.sort()
    print(f"{ny}x{nx} U={U}: median {rates[2]:.0f} MLUPS "
          f"(min {rates[0]:.0f} max {rates[-1]:.0f})", flush=True)


if __name__ == "__main__":
    for spec in sys.argv[1].split():
        ny, nx, U = map(int, spec.split(","))
        measure(ny, nx, U)
