"""Round-3 TPU timings: fused screened-gradient solve + resident kernel.

All hot loops run INSIDE one jit (lax.fori_loop / scan chains) — per-call
tunnel round-trip on the axon backend is ~30 ms and would swamp everything.

Usage: python benchmarks/profile_r3.py [solve|resident|both]
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


def _time_loop(fn, x, iters, reps=5, label=""):
    """fn: x -> x chained `iters` times inside one jit."""
    run = jax.jit(lambda x0: jax.lax.fori_loop(0, iters, lambda i, v: fn(v),
                                               x0))
    y = run(x)
    float(jnp.sum(jnp.ravel(y)[:4]))  # sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y = run(x)
        float(jnp.sum(jnp.ravel(y)[:4]))
        ts.append((time.perf_counter() - t0) / iters)
    ms = 1e3 * np.median(ts)
    print(f"{label:46s} {ms:9.2f} ms/iter  (min {1e3*min(ts):.2f})",
          flush=True)
    return ms


def bench_solve(n=8192):
    from lb2d_tpu.ops.dft import fft2_mm, ifft2_mm, screened_gradients_mm

    print(f"--- screened-gradient solve at {n}^2 ---", flush=True)
    fx = (np.fft.fftfreq(n) * n).astype(np.float32)
    gx = fx.copy()
    gx[n // 2] = 0.0
    fxj = jnp.asarray(fx)
    gxj = jnp.asarray(gx)
    lam2 = np.float32(100.0)

    key = jax.random.PRNGKey(0)
    rho = jax.random.uniform(key, (n, n), jnp.float32)

    def old_solve(r):
        # the round-2 packed path (_ScreenedVelocity.__call__ matmul branch)
        KX = fxj[None, :]
        KY = fxj[:, None]
        rescale = 1.0 / (lam2 * (KX * KX + KY * KY) + 1.0)
        ax = (2.0 * np.pi) * gxj[None, :]
        ay = (2.0 * np.pi) * gxj[:, None]
        cr, ci = fft2_mm(r)
        cr, ci = cr * rescale, ci * rescale
        xg, yg = ifft2_mm(-ax * ci - ay * cr, ax * cr - ay * ci)
        return xg + 0.1 * yg  # chainable

    def new_solve(r):
        xg, yg = screened_gradients_mm(r, fxj, fxj, gxj, gxj, lam2)
        return xg + 0.1 * yg

    t_new = _time_loop(new_solve, rho, 10, label="NEW fused half-spectrum solve")
    t_old = _time_loop(old_solve, rho, 10, label="OLD packed full solve")
    print(f"speedup: {t_old / t_new:.2f}x", flush=True)

    # parity old vs new (single call, small relative tolerance)
    a = jax.jit(old_solve)(rho)
    b = jax.jit(new_solve)(rho)
    scale = float(jnp.max(jnp.abs(a)))
    err = float(jnp.max(jnp.abs(a - b))) / scale
    print(f"old-vs-new parity: {err:.2e}", flush=True)


def bench_resident():
    from lb2d_tpu.models.pipe_flow import PipeFlow

    print("--- resident kernel ---", flush=True)
    for (ny, nx) in ((32, 256), (256, 256), (512, 512), (640, 640)):
        N = ny - 1
        sim = PipeFlow(diameter=1.5, rho=10.0, viscosity=5.0,
                       pressure_grad=-100.0,
                       pipe_length=1.5 * (nx - 1.5) / N, N=N)
        assert (sim.ny, sim.nx) == (ny, nx), (sim.ny, sim.nx)
        steps = 20000 if ny * nx <= 300000 else 4000
        sim.run(steps, timed=True)  # warm happens inside run
        rates = []
        for _ in range(5):
            sim.run(steps, timed=True)
            rates.append(sim.last_mlups)
        rates.sort()
        print(f"resident {ny}x{nx}: median {rates[2]:.0f} MLUPS "
              f"(min {rates[0]:.0f} max {rates[-1]:.0f}) backend={sim.backend}",
              flush=True)

    # reference point: temporal backend at 512^2
    sim = PipeFlow(diameter=1.5, rho=10.0, viscosity=5.0,
                   pressure_grad=-100.0, pipe_length=1.5 * 510.5 / 511,
                   N=511, backend="temporal")
    sim.run(4000, timed=True)
    rates = []
    for _ in range(3):
        sim.run(4000, timed=True)
        rates.append(sim.last_mlups)
    print(f"temporal 512x512: median {sorted(rates)[1]:.0f} MLUPS", flush=True)


def bench_solve_stages(n=8192):
    """Per-stage on-device cost of the fused solve (chained with an
    iteration-dependent epsilon to defeat CSE; subtract the ~0.7 ms
    elementwise baseline)."""
    from lb2d_tpu.ops.dft import _dft_axis0, _dft_axis1, _mirror_x

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (n, n), jnp.float32)
    hp = (n // 2 + 8 // 1)  # hy padded
    hp = -(-(n // 2 + 1) // 8) * 8
    xh = jax.random.uniform(key, (hp, n), jnp.float32)

    def loop(fn, x0, label, iters=10):
        run = jax.jit(lambda v: jax.lax.fori_loop(
            0, iters, lambda i, a: fn(a + 1e-12 * i.astype(jnp.float32)), v))
        y = run(x0)
        float(jnp.sum(jnp.ravel(y)[:4]))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            y = run(x0)
            float(jnp.sum(jnp.ravel(y)[:4]))
            ts.append((time.perf_counter() - t0) / iters)
        print(f"{label:42s} {1e3*np.median(ts):8.2f} ms", flush=True)

    loop(lambda a: a * 1.0001, x, "baseline elementwise [n,n]")
    loop(lambda a: jnp.pad(_dft_axis0(a, None, False, out_rows=hp)[0],
                           ((0, n - hp), (0, 0))),
         x, "fwd-y real half (+pad)")
    loop(lambda a: _dft_axis1(a, a, False)[0], xh, "fwd-x complex half rows")
    loop(lambda a: jnp.pad(_mirror_x(jnp.flip(a[1:n - hp + 1], axis=0)),
                           ((0, 2 * hp - n), (0, 0))), xh, "mirror ops half")
    loop(lambda a: _dft_axis1(a, a, True)[0], x, "inv-x complex full")
    loop(lambda a: _dft_axis0(a, a, True)[0], x, "inv-y complex full")


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    if what in ("solve", "both"):
        bench_solve()
    if what in ("resident", "both"):
        bench_resident()
    if what == "stages":
        bench_solve_stages()
