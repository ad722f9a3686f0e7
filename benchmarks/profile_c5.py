"""Time the composed config-5 step (exact coupling) and compare with the
sum of its parts (see profile_mc.py). Also dumps the compiled HLO's
full-size copy count — the round-3 profiling found XLA protective copies
around the aliased pallas_call dominate when composition > parts.

Usage: python benchmarks/profile_c5.py [n] [mesh|nomesh|hlo]
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


def build(n, with_mesh):
    from lb2d_tpu.models.multicomponent import Fluid, SimulationRunner
    from lb2d_tpu.parallel.sharded import make_mesh

    sim = SimulationRunner(nx=n, ny=n, L_lb=n, T_lb=1.0,
                           num_populations=2, porous=True)
    for i in range(2):
        sim.add_fluid(Fluid(sim, i, nu_e=1.0 / 6.0, epsilon=0.8,
                            nu_fluid=1.0 / 6.0, K=10.0, Fe=0.1))
    sim.complete_setup()
    rng = np.random.RandomState(0)
    base = 0.5 + 0.05 * rng.rand(n, n).astype(np.float32)
    sim.fluid_list[0].initialize(base)
    sim.fluid_list[1].initialize(1.0 - base)
    sim.add_interaction_force(0, 1, G_int=1.5, potential="shan_chen",
                              potential_parameters=[1.0])
    sim.add_screened_poisson_force(0, 1, interaction_length=10.0,
                                   amplitude=1e-4)
    if with_mesh:
        sim.shard_over(make_mesh(1, shape=(1, 1)))
    return sim


def main(n, mode):
    sim = build(n, mode == "mesh")
    kstep = sim._make_kernel_step()
    carried = getattr(kstep, "carried", False)
    print(f"kernel available: {kstep is not None}, carried: {carried}",
          flush=True)

    if carried:
        def loop(f, k):
            return jax.lax.fori_loop(0, k, lambda i, s: kstep(s),
                                     kstep.init_carry(f))[0]
    else:
        def loop(f, k):
            return jax.lax.fori_loop(0, k, lambda i, s: kstep(s), f)

    if mode == "hlo":
        hlo = jax.jit(loop, donate_argnums=0).lower(
            sim.f, jnp.int32(10)).compile().as_text()
        import re
        copies = re.findall(r"copy[^\n]*f32\[[^\]]*\]", hlo)
        big = [c for c in copies if f"{n},{n}" in c]
        print(f"{len(copies)} copies, {len(big)} full-size:")
        for c in big[:40]:
            print("  ", c[:140])
        return

    run = jax.jit(loop, donate_argnums=0)
    iters = 10
    f = run(sim.f, jnp.int32(iters))
    float(jnp.sum(jnp.ravel(f)[:4]))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        f = run(f, jnp.int32(iters))
        float(jnp.sum(jnp.ravel(f)[:4]))
        ts.append((time.perf_counter() - t0) / iters)
    ms = 1e3 * np.median(ts)
    print(f"composed exact step ({mode}): {ms:.2f} ms/step "
          f"-> {n * n / ms / 1e3:.0f} MLUPS (min {1e3*min(ts):.2f})",
          flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    mode = sys.argv[2] if len(sys.argv) > 2 else "nomesh"
    main(n, mode)
