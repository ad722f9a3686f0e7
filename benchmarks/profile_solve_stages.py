"""Per-stage timing of the Pallas screened-gradient solve at 8192^2:
fwd-y kernel, XLA transpose, fwd-x kernel, multiplier/mirror/pack stage,
inv-x kernel, transpose, inv-y kernel.

Usage: python benchmarks/profile_solve_stages.py [n]
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


def _time(fn, args, iters=20, reps=5, label=""):
    def loop(x0, *rest):
        def body(i, v):
            r = fn(v, *rest)
            # keep the carry shape: fold the result back lightly
            return v * 0.999999 + 1e-30 * jnp.sum(r)
        return jax.lax.fori_loop(0, iters, body, x0)
    run = jax.jit(loop)
    y = run(*args)
    float(jnp.sum(jnp.ravel(y)[:4]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        y = run(*args)
        float(jnp.sum(jnp.ravel(y)[:4]))
        ts.append((time.perf_counter() - t0) / iters)
    ms = 1e3 * np.median(ts)
    print(f"{label:44s} {ms:8.2f} ms  (min {1e3*min(ts):.2f})", flush=True)
    return ms


def main(n=8192):
    from lb2d_tpu.ops.dft_pallas import (_factor, _hpad, make_axis0_dft)

    key = jax.random.PRNGKey(0)
    rho = jax.random.uniform(key, (n, n), jnp.float32)
    hy = n // 2 + 1
    n1y, _ = _factor(n)
    hp = _hpad(n, n1y)
    half = jax.random.uniform(key, (hp, n), jnp.float32)
    halfT = jax.random.uniform(key, (n, hp), jnp.float32)
    full = jax.random.uniform(key, (n, n), jnp.float32)

    fwd_y = make_axis0_dft(n, n, real_input=True, out_rows=hp)
    _time(lambda r: fwd_y(r)[0], (rho,), label=f"fwd-y real half ({n}->{hp})")

    _time(lambda h: h.T + 0.0, (half,), label=f"XLA transpose [{hp},{n}]")
    _time(lambda h: h.T + 0.0, (full,), label=f"XLA transpose [{n},{n}]")

    fwd_x = make_axis0_dft(n, hp, real_input=False)
    _time(lambda h: fwd_x(h, h)[0], (halfT,), label=f"fwd-x complex [{n},{hp}]")

    inv_x = make_axis0_dft(n, n, real_input=False, inverse=True)
    _time(lambda h: inv_x(h, h)[0], (full,), label=f"inv-x complex [{n},{n}]")

    # the multiplier/mirror/pack stage in isolation
    fx = jnp.asarray((np.fft.fftfreq(n) * n).astype(np.float32))
    gx = fx

    def mult(Xr):
        Xi = Xr
        KX = fx[:, None]
        KY = fx[None, :hp]
        s = 1.0 / (100.0 * (KX * KX + KY * KY) + 1.0)
        ax = (2.0 * np.pi) * gx[:, None] * s
        ay = (2.0 * np.pi) * gx[None, :hp] * s
        axXr, axXi = ax * Xr[:, :hp], ax * Xi[:, :hp]
        ayXr, ayXi = ay * Xr[:, :hp], ay * Xi[:, :hp]
        Pr_h = -(axXi + ayXr)
        Qr = ayXr - axXi

        def mirror_rows(a):
            return jnp.concatenate([a[:1], jnp.flip(a[1:], axis=0)], axis=0)

        def tail(q):
            return mirror_rows(jnp.flip(q[:, 1:n - hy + 1], axis=1))
        Pr = jnp.concatenate([Pr_h[:, :hy], tail(Qr)], axis=1)
        return Pr
    _time(mult, (full,), label="mult/mirror/pack (1 of 2 planes)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
