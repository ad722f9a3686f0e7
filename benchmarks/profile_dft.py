"""Profile the 8192^2 matmul-DFT screened-Poisson solve stage by stage.

Run on the real TPU, one process at a time:
    python benchmarks/profile_dft.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from lb2d_tpu.ops.dft import dft_mats, fft2_mm, ifft2_mm, _fft1_fast

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    # readback sync (axon: block_until_ready can ack early on donated bufs)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:2, :2]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:2, :2]))
        ts.append(time.perf_counter() - t0)
    ms = 1e3 * np.median(ts)
    print(f"{name:44s} {ms:8.2f} ms  (min {1e3*min(ts):.2f})")
    return ms


def main():
    print("backend:", jax.default_backend(), " n =", N)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N, N), jnp.float32)

    # 1. current full pair
    pair = jax.jit(lambda r: ifft2_mm(*fft2_mm(r)))
    timeit("full fwd+inv pair (current)", pair, x)

    # 2. forward only
    timeit("fwd fft2_mm (real in, zero imag)", jax.jit(fft2_mm), x)

    # 3. single 1-D complex pass (x axis), jitted alone
    f1 = jax.jit(lambda r, i: _fft1_fast(r, i, False))
    xi = jnp.zeros_like(x)
    timeit("one 1-D pass complex (4 matmuls)", f1, x, xi)

    # 4. single 1-D pass real input, imag matmuls skipped by hand
    def f1_real(r):
        n = r.shape[-1]
        n1, n2 = 64, n // 64
        M = jnp.transpose(r.reshape(N, n1, n2), (1, 0, 2)).reshape(n1, N * n2)
        F1c, F1s = dft_mats(n1, False)
        mm = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
        T1r, T1i = mm(F1c, M), mm(F1s, M)
        from lb2d_tpu.ops.dft import _twiddle, _cmatmul
        twc, tws = _twiddle(n1, n2, False)
        T1r = T1r.reshape(n1, N, n2)
        T1i = T1i.reshape(n1, N, n2)
        T2r = T1r * twc[:, None, :] - T1i * tws[:, None, :]
        T2i = T1r * tws[:, None, :] + T1i * twc[:, None, :]
        F2c, F2s = dft_mats(n2, False)
        Xr, Xi = _cmatmul(T2r.reshape(n1 * N, n2), T2i.reshape(n1 * N, n2),
                          F2c, F2s)
        Xr = jnp.transpose(Xr.reshape(n1, N, n2), (1, 2, 0)).reshape(N, N)
        Xi = jnp.transpose(Xi.reshape(n1, N, n2), (1, 2, 0)).reshape(N, N)
        return Xr, Xi
    timeit("one 1-D pass real (2+4 matmuls)", jax.jit(f1_real), x)

    # 5. raw matmul cost: the step-3-shaped matmul alone, HIGHEST vs HIGH vs default
    n1, n2 = 64, N // 64
    a = jax.random.uniform(key, (n1 * N, n2), jnp.float32)
    b = jax.random.uniform(key, (n2, n2), jnp.float32)
    for prec in ("HIGHEST", "HIGH", "DEFAULT"):
        p = getattr(jax.lax.Precision, prec)
        mm = jax.jit(lambda a, b, p=p: jnp.dot(
            a, b, preferred_element_type=jnp.float32, precision=p))
        timeit(f"raw [{n1*N}x{n2}]@[{n2}x{n2}] {prec}", mm, a, b)
    a1 = jax.random.uniform(key, (n1, N * n2), jnp.float32)
    b1 = jax.random.uniform(key, (n1, n1), jnp.float32)
    mm1 = jax.jit(lambda b, a: jnp.dot(b, a, preferred_element_type=jnp.float32,
                                       precision=jax.lax.Precision.HIGHEST))
    timeit(f"raw [{n1}x{n1}]@[{n1}x{N*n2}] HIGHEST", mm1, b1, a1)

    # 6. transpose cost
    tr = jax.jit(lambda x: jnp.transpose(x.reshape(N, 64, N // 64),
                                         (1, 0, 2)).reshape(64, -1) + 0.0)
    timeit("reshape-transpose (1,0,2) [N,64,128]", tr, x)
    t2 = jax.jit(lambda x: x.T + 0.0)
    timeit("plain 2-D transpose", t2, x)

    # 7. elementwise twiddle-shaped op
    ew = jax.jit(lambda r, i: (r * 1.5 - i * 0.5, r * 0.5 + i * 1.5))
    timeit("elementwise complex twiddle shape", ew, x, xi)

    # 8. accuracy of HIGH vs HIGHEST on the pair at a smaller grid
    if N <= 4096:
        ref = np.fft.fft2(np.asarray(x[:512, :512]).astype(np.float64))


if __name__ == "__main__":
    main()
