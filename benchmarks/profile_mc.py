"""Decompose the BASELINE config-5 exact-coupling step at 8192^2.

Times each component INSIDE one jit (axon tunnel RTT ~30 ms/call would
swamp per-call timing), synchronized by device->host readbacks (the axon
block_until_ready gotcha). Large arrays are passed as ARGUMENTS, never
closed over (closed-over device arrays bake into the executable as
constants — a 1 GB constant makes the compile pathological).

* mc kernel K=1 with ext planes (the fused porous 2-fluid sweep)
* the same kernel machinery with identity physics (ring+stream ceiling)
* post-stream density pass (9 rolls + reduce, the solve's input)
* screened-gradient solve (Pallas 4-step path)

Usage: python benchmarks/profile_mc.py [n]
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


def _time_loop(fn, args, iters, reps=5, label=""):
    """fn: (*args) -> args[0]-shaped value, chained through a fori_loop."""
    def loop(x0, *rest):
        return jax.lax.fori_loop(0, iters, lambda i, v: fn(v, *rest), x0)
    run = jax.jit(loop)
    y = run(*args)
    float(jnp.sum(jnp.ravel(y)[:4]))  # readback sync (axon gotcha)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y = run(*args)
        float(jnp.sum(jnp.ravel(y)[:4]))
        ts.append((time.perf_counter() - t0) / iters)
    ms = 1e3 * np.median(ts)
    print(f"{label:52s} {ms:9.2f} ms/iter  (min {1e3*min(ts):.2f})",
          flush=True)
    return ms


def main(n=8192, which="all"):
    from lb2d_tpu.core.lattice import D2Q9
    from lb2d_tpu.ops.fused_mc import (
        MCKernelConfig, FluidParams, _make_halo_kernel, make_mc_halo_step,
        pick_mc_tiling)

    C = 2
    q = 9
    P = q * C
    cells = n * n
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.rand(P, n, n).astype(np.float32) * 0.1 + 0.05)
    ext = jnp.asarray(rng.rand(2 * C, n, n).astype(np.float32) * 1e-4)
    interpret = jax.default_backend() != "tpu"

    cfg = MCKernelConfig(
        fluids=(FluidParams(omega=1.0, epsilon=0.8, nu_fluid=1.0 / 6.0,
                            K=10.0, Fe=0.1),) * 2,
        porous=True, zero_density=1e-6,
        interactions=((0, 1, 1.5, 1, (1.0,), 1),),
        has_ext=True)
    tiling = pick_mc_tiling(n, n, C, cfg.belt, True, 1)
    print(f"tiling CH={tiling[0]} K={tiling[1]}", flush=True)

    if which in ("all", "kernel"):
        kernel = make_mc_halo_step(H=n, nx=n, cfg=cfg, dtype=jnp.float32,
                                   interpret=interpret, k_steps=1)
        CH = kernel.chunk

        def kstep(fv, e):
            top = fv[:, n - CH:, :]
            bot = fv[:, :CH, :]
            return kernel(fv, top, bot, e)
        ms = _time_loop(kstep, (f, ext), 30,
                        label="mc kernel K=1 ext (physics)")
        print(f"    -> {cells / ms / 1e3:.0f} MLUPS kernel-only; HBM "
              f"{(2 * P + 2 * C) * cells * 4 / ms / 1e6:.0f} GB/s",
              flush=True)

    if which in ("all", "ident"):
        def phys_id(fs, rho, rho_ext, e):
            return fs
        CH = pick_mc_tiling(n, n, C, cfg.belt, True, 1)[0]
        ident = _make_halo_kernel(H=n, nx=n, C=C, CH=CH, K=1, belt=1,
                                  n_ext=2 * C, phys=phys_id,
                                  interpret=interpret)

        def istep(fv, e):
            top = fv[:, n - CH:, :]
            bot = fv[:, :CH, :]
            return ident(fv, top, bot, e)
        ms_i = _time_loop(istep, (f, ext), 30,
                          label="identity physics (ring+stream)")
        print(f"    -> HBM {(2 * P + 2 * C) * cells * 4 / ms_i / 1e6:.0f} "
              "GB/s", flush=True)

    if which in ("all", "xla"):
        ms_c = _time_loop(lambda v: v + 1.0, (f,), 30,
                          label="XLA elementwise +1 (same f footprint)")
        print(f"    -> HBM {2 * P * cells * 4 / ms_c / 1e6:.0f} GB/s",
              flush=True)

    if which in ("all", "density"):
        cx, cy = D2Q9.cx, D2Q9.cy

        def dens(fv):
            r = None
            for j in range(q):
                p = fv[j * C]
                if cy[j]:
                    p = jnp.roll(p, cy[j], axis=0)
                if cx[j]:
                    p = jnp.roll(p, cx[j], axis=1)
                r = p if r is None else r + p
            return fv.at[0].add(1e-30 * r)  # keep carry shape, defeat DCE
        _time_loop(dens, (f,), 30,
                   label="post-stream density (9 rolls+reduce)")

    if which in ("all", "solve"):
        from lb2d_tpu.models.waves import _ScreenedVelocity
        vel = _ScreenedVelocity(n, n, 10.0, 1.0, 1.0, 1.0)
        rho0 = jnp.asarray(rng.rand(n, n).astype(np.float32))

        def solve(r):
            gx, gy = vel(r)
            return r + 1e-30 * gx + 1e-30 * gy
        _time_loop(solve, (rho0,), 10, label="screened-gradient solve")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    main(n, which)
