"""Accuracy + speed of the Pallas screened-gradient solve vs matmul
precision (HIGHEST = bf16x6 vs HIGH = bf16x3), oracle = numpy complex128.

Usage: python benchmarks/probe_solve_prec.py [n]
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


def oracle(rho, lam, n):
    fx = np.fft.fftfreq(n) * n
    KX = fx[:, None]
    KY = fx[None, :]
    s = 1.0 / (lam * lam * (KX ** 2 + KY ** 2) + 1.0)
    gxm = fx.copy()
    gxm[n // 2] = 0.0
    ph = np.fft.fft2(rho.astype(np.float64)) * s
    xg = np.real(np.fft.ifft2(2j * np.pi * gxm[None, :] * ph))
    yg = np.real(np.fft.ifft2(2j * np.pi * gxm[:, None] * ph))
    return xg, yg


def main(n=2048):
    import lb2d_tpu.ops.dft_pallas as dp

    rng = np.random.RandomState(0)
    rho = rng.rand(n, n).astype(np.float32)
    lam = 10.0
    fx = (np.fft.fftfreq(n) * n).astype(np.float32)
    gm = fx.copy()
    gm[n // 2] = 0.0
    rho_j = jnp.asarray(rho)
    fxj = jnp.asarray(fx)
    gmj = jnp.asarray(gm)

    xg_o, yg_o = oracle(rho, lam, n)
    sc = max(np.abs(xg_o).max(), np.abs(yg_o).max())

    for prec in ("highest", "bf16x3", "default"):
        if prec == "default":
            dp._PREC = jax.lax.Precision.DEFAULT
        kw = dict(mm=prec if prec == "bf16x3" else "highest")

        def solve(r, kw=kw):
            return dp.screened_gradients_pl(r, fxj, fxj, gmj, gmj,
                                            np.float32(lam * lam), **kw)
        run = jax.jit(lambda r: jax.lax.fori_loop(
            0, 10, lambda i, v: v * 0.0 + jnp.stack(solve(v[0])),
            jnp.stack([r, r])))
        # accuracy (single call)
        xg, yg = jax.jit(solve)(rho_j)
        ex = float(np.abs(np.asarray(xg) - xg_o).max() / sc)
        ey = float(np.abs(np.asarray(yg) - yg_o).max() / sc)
        # speed
        y = run(rho_j)
        float(jnp.sum(jnp.ravel(y)[:4]))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            y = run(rho_j)
            float(jnp.sum(jnp.ravel(y)[:4]))
            ts.append((time.perf_counter() - t0) / 10)
        ms = 1e3 * float(np.median(ts))
        print(f"{prec:8s}: rel err xg {ex:.2e} yg {ey:.2e}   {ms:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048)
