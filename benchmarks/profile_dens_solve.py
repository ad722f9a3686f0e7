"""Light profiling of the config-5 non-kernel pieces at 8192^2:
post-stream density (9 rolls + reduce) and the screened-gradient solve.

Usage: python benchmarks/profile_dens_solve.py [n]
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


def _time_loop(fn, args, iters, reps=5, label="", donate=False):
    def loop(x0, *rest):
        return jax.lax.fori_loop(0, iters, lambda i, v: fn(v, *rest), x0)
    run = jax.jit(loop, donate_argnums=0 if donate else ())
    y = run(*args)
    float(jnp.sum(jnp.ravel(y)[:4]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y = run(*((y,) + args[1:]) if donate else args)
        float(jnp.sum(jnp.ravel(y)[:4]))
        ts.append((time.perf_counter() - t0) / iters)
    ms = 1e3 * np.median(ts)
    print(f"{label:52s} {ms:9.2f} ms/iter  (min {1e3*min(ts):.2f})",
          flush=True)
    return ms


def main(n=8192):
    from lb2d_tpu.core.lattice import D2Q9
    q = 9
    cx, cy = D2Q9.cx, D2Q9.cy
    key = jax.random.PRNGKey(0)
    f9 = jax.random.uniform(key, (q, n, n), jnp.float32)

    def dens(fv):
        r = None
        for j in range(q):
            p = fv[j]
            if cy[j]:
                p = jnp.roll(p, cy[j], axis=0)
            if cx[j]:
                p = jnp.roll(p, cx[j], axis=1)
            r = p if r is None else r + p
        return fv.at[0].add(1e-30 * r)
    _time_loop(dens, (f9,), 30, label="post-stream density (9 rolls)",
               donate=True)

    del f9
    from lb2d_tpu.models.waves import _ScreenedVelocity
    rho0 = jax.random.uniform(key, (n, n), jnp.float32)
    for allow in (True, False):
        vel = _ScreenedVelocity(n, n, 10.0, 1.0, 1.0, 1.0)
        if not allow and hasattr(vel, "allow_pallas"):
            vel.allow_pallas = False

        def solve(r, vel=vel):
            gx, gy = vel(r)
            return r + 1e-30 * gx + 1e-30 * gy
        _time_loop(solve, (rho0,), 10,
                   label=f"screened-gradient solve (pallas={allow})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
