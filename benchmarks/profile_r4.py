"""Round-4 TPU measurements (run stages one at a time; each prints a
JSON-ish line). Stages:

  expansion   — Expansion zoo config (paired Box-Muller draws) + in-jit
                component split: noise draw vs full collision
  resident    — diffusion-family resident kernel vs temporal at the
                reference's scientific grid sizes (128^2-512^2)
  shardtax    — unsharded temporal 8192^2 control vs the sharded
                mesh=1dev number (VERDICT r3 #3)
  repelling   — RepellingFisherWave zoo config (reuse-gated nested solve)

Usage: python benchmarks/profile_r4.py <stage>
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def timed_run(sim, n, reps=5):
    sim.run(n, timed=True)  # warm
    rates = []
    for _ in range(reps):
        sim.run(n, timed=True)
        rates.append(sim.last_mlups)
    return float(np.median(rates)), min(rates), max(rates)


def stage_expansion():
    from lb2d_tpu.models.multifield import Expansion, FisherExpansion

    sim = Expansion(Lx=4.1, Ly=4.1, mu_standard=1.0, mu_list=[1.0, 0.8],
                    D_standard=1.0, D_list=[1.0, 1.2], N=511,
                    Nb=10.0, Dc=1.0)
    med, lo, hi = timed_run(sim, 2048)
    print(f'{{"config": "Expansion 2048^2-zoo (paired draws)", '
          f'"grid": "{sim.ny}x{sim.nx}", "K": {sim.steps_per_call}, '
          f'"mlups": {med:.1f}, "min": {lo:.1f}, "max": {hi:.1f}}}',
          flush=True)
    det = FisherExpansion(Lx=4.1, Ly=4.1, mu_standard=1.0, mu_list=[1.0, 0.8],
                          D_standard=1.0, D_list=[1.0, 1.2], N=511,
                          initial_frac_widths=[0.5, 0.5],
                          initial_frac_indices=[0, 1])
    medd, lod, hid = timed_run(det, 2048)
    print(f'{{"config": "FisherExpansion (deterministic sibling)", '
          f'"mlups": {medd:.1f}, "min": {lod:.1f}, "max": {hid:.1f}}}',
          flush=True)


def stage_resident():
    from lb2d_tpu.models.diffusion import (ReactionAdvectionDiffusion,
                                           ReactionAdvectionDiffusionStochastic)

    # N chosen so ny = nx = 128/256/512 exactly (aligned -> resident)
    for N, steps in ((42, 400_000), (84, 200_000), (170, 60_000)):
        sim = ReactionAdvectionDiffusion(
            N=N, g=5.0, z=0.1, D=0.01, vx=1.0, vy=0.5, vc=1.0,
            Lx=0.31 if N != 170 else 0.302, Ly=0.31 if N != 170 else 0.302)
        med, lo, hi = timed_run(sim, steps, reps=3)
        print(f'{{"config": "RAD {sim.ny}x{sim.nx}", '
              f'"backend": "{sim.backend}", "mlups": {med:.1f}, '
              f'"min": {lo:.1f}, "max": {hi:.1f}}}', flush=True)
    for N, steps in ((42, 100_000), (170, 30_000)):
        sim = ReactionAdvectionDiffusionStochastic(
            N=N, g=5.0, Dg=1e-3, z=0.1, D=0.01, vx=0.5, vy=0.0, vc=1.0,
            Lx=0.31 if N != 170 else 0.302, Ly=0.31 if N != 170 else 0.302)
        med, lo, hi = timed_run(sim, steps, reps=3)
        print(f'{{"config": "RADStochastic {sim.ny}x{sim.nx}", '
              f'"backend": "{sim.backend}", "mlups": {med:.1f}, '
              f'"min": {lo:.1f}, "max": {hi:.1f}}}', flush=True)


def stage_shardtax():
    from lb2d_tpu.models.pipe_flow import PipeFlow

    sim = PipeFlow(diameter=1.0, rho=1.0, viscosity=0.1, pressure_grad=-0.01,
                   pipe_length=1.0, N=8191, backend="auto")
    med, lo, hi = timed_run(sim, 320, reps=5)
    print(f'{{"config": "UNSHARDED pipe 8192^2 ({sim.backend} '
          f'K={sim.steps_per_call})", "mlups": {med:.1f}, '
          f'"min": {lo:.1f}, "max": {hi:.1f}}}', flush=True)


def stage_repelling():
    from lb2d_tpu.models.waves import RepellingFisherWave

    for tol in (2e-3,):
        sim = RepellingFisherWave(Lx=1.0, Ly=1.0, E=2.0, R0=0.25, N=128,
                                  max_inner_iter=60, reuse_tolerance=tol)
        med, lo, hi = timed_run(sim, 3000, reps=3)
        print(f'{{"config": "RepellingFisherWave reuse={tol}", '
              f'"mlups": {med:.1f}, "min": {lo:.1f}, "max": {hi:.1f}}}',
              flush=True)


if __name__ == "__main__":
    dict(expansion=stage_expansion, resident=stage_resident,
         shardtax=stage_shardtax,
         repelling=stage_repelling)[sys.argv[1]]()
