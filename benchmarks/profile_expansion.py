"""In-jit component split of the Expansion temporal kernel at the zoo
grid (1024^2, F=3, K=8): raw kernel with noise vs noise-disabled
(lb_Dg=0, same clipping/physics) vs the full model step (kernel + seam
band patch). Attributes the Expansion family's gap to its deterministic
sibling (VERDICT r3 #4).

Usage: python benchmarks/profile_expansion.py
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
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from lb2d_tpu.models.multifield import Expansion
from lb2d_tpu.ops.fused import make_temporal_multifield_step


def _time(run, state, niter, k_per, cells, label, reps=5):
    y = run(state)
    float(jnp.sum(jnp.ravel(y[0] if isinstance(y, tuple) else y)[:4]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y = run(y)
        float(jnp.sum(jnp.ravel(y[0] if isinstance(y, tuple) else y)[:4]))
        ts.append((time.perf_counter() - t0) / (niter * k_per))
    ms = 1e3 * float(np.median(ts))
    print(f"{label:34s} {ms:7.3f} ms/step  {cells / (ms * 1e-3) / 1e6:8.0f}"
          f" MLUPS", flush=True)
    return ms


def main():
    sim = Expansion(Lx=4.1, Ly=4.1, mu_standard=1.0, mu_list=[1.0, 0.8],
                    D_standard=1.0, D_list=[1.0, 1.2], N=511,
                    Nb=10.0, Dc=1.0)
    ny, nx, F = sim.ny, sim.nx, sim.num_fields
    K = sim.steps_per_call
    cells = ny * nx
    print(f"grid {ny}x{nx} F={F} K={K}", flush=True)

    f0, _ = sim.state
    niter = 256 // K
    base_kw = dict(
        ny=ny, nx=nx, num_fields=F,
        omegas=list(np.asarray(sim.omega).ravel())
        + [float(sim.omega_nutrient)],
        lb_G=sim.lb_G, cutoff=sim.zero_cutoff,
        u_lb=float(sim.lb_vx), v_lb=float(sim.lb_vy),
        physics="expansion", k_steps=K)

    # raw kernel, noise on
    kern = make_temporal_multifield_step(lb_Dg=sim.lb_Dg, **base_kw)
    seed = jnp.zeros((1, 1), jnp.int32)
    run = jax.jit(lambda f: jax.lax.fori_loop(
        0, niter, lambda i, f: kern(f, seed + i), f), donate_argnums=0)
    _time(run, f0 + 0.0, niter, K, cells, "raw kernel (Milstein noise)")

    # raw kernel, lb_Dg = 0 (same physics minus the noise term)
    kern0 = make_temporal_multifield_step(
        lb_Dg=np.zeros_like(np.asarray(sim.lb_Dg)), **base_kw)
    run0 = jax.jit(lambda f: jax.lax.fori_loop(
        0, niter, lambda i, f: kern0(f), f), donate_argnums=0)
    _time(run0, f0 + 0.0, niter, K, cells, "raw kernel (lb_Dg=0)")

    # the model's full step (kernel + seam band patch)
    stepfn = sim.make_step()
    runm = jax.jit(lambda s: jax.lax.fori_loop(
        0, niter, lambda i, s: stepfn(s), s), donate_argnums=0)
    _time(runm, (f0 + 0.0, jax.random.PRNGKey(1)), niter, K, cells,
          "model stepK (kernel + band patch)")


if __name__ == "__main__":
    main()
