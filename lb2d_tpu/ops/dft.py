"""Matmul-based 2-D DFT — the MXU path for spectral solves.

The axon-tunneled TPU backend has no XLA FFT custom-call (``jnp.fft.*``
raises UNIMPLEMENTED), and even where FFT exists, a dense DFT-as-matmul maps
straight onto the 128x128 systolic array: ``X_hat = F_y @ X @ F_x^T`` with
``F[k, n] = exp(-2 pi i k n / N)``. Complex arithmetic is carried as
(real, imag) pairs -> 4 real matmuls per side, all ``preferred_element_type=
float32`` so the MXU accumulates in full precision.

Cost at 4096^2 is ~16 * 2 * n^3 flops per full solve — milliseconds on a
v5e, and the spectral models call it once per step at much smaller grids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dft_mats", "fft2_mm", "ifft2_mm"]


def dft_mats(n: int, inverse: bool = False):
    """(cos, sin) parts of the DFT matrix ``exp(sign * 2 pi i k n / N)``;
    the inverse includes the 1/N normalization (numpy convention).

    Built IN-GRAPH, not as host constants: at 8192^2 each matrix is 268 MB
    and closure-captured constants get baked into the executable (host
    round-trip at lowering + RESOURCE_EXHAUSTED). The phase is computed as
    ``2 pi ((k k') mod n) / n`` with an exact int32 product (k k' < 2^31
    for n <= 2^15) — a plain fp32 ``outer(k, k)`` would lose the phase
    entirely at large n (|ang| up to ~5e4 radians)."""
    if n > 32768:
        raise ValueError(
            f"dft_mats: n={n} > 2^15 overflows the exact int32 phase "
            "product k*k' (the resulting matrix would be silently wrong)")
    k = jax.lax.iota(jnp.int32, n)
    ij = k[:, None] * k[None, :]
    ang = (2.0 * np.pi / n) * (ij % n).astype(jnp.float32)
    sign = 1.0 if inverse else -1.0
    c = jnp.cos(ang)
    s = sign * jnp.sin(ang)
    if inverse:
        c = c / n
        s = s / n
    return c, s


def _cmatmul(ar, ai, br, bi):
    """(ar + i ai) @ (br + i bi) with full-f32 MXU passes.

    ``Precision.HIGHEST`` matters: the TPU default runs f32 matmuls as one
    bf16 pass, which costs the DFT ~3 significant digits (4.6e-2 roundtrip
    error at 8192^2 vs 3.3e-5) while the extra passes are nearly free here
    (the 4-step factors are skinny, so these matmuls are bandwidth-bound:
    84 ms vs 71 ms for the full 8192^2 forward+inverse)."""
    mm = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    return mm(ar, br) - mm(ai, bi), mm(ar, bi) + mm(ai, br)


def _split_n(n: int) -> tuple[int, int] | None:
    """Factor ``n = n1 * n2`` with ``n1 <= n2`` as close to ``sqrt(n)`` as
    possible — the Bailey 4-step split. None for small or prime-ish n:
    below ~4096 the direct [n x n] DFT matmul both fills the MXU better
    (the split's [n1 x n1] factors are tiny) and is already sub-ms."""
    if n < 4096:
        return None
    best = None
    n1 = int(np.sqrt(n))
    while n1 >= 16:
        if n % n1 == 0:
            best = (n1, n // n1)
            break
        n1 -= 1
    return best


def _twiddle(n1: int, n2: int, inverse: bool):
    """``W_N^(+-bc)`` for c < n1 (rows), b < n2 (cols); exact int32 phase
    (bc < N so no mod needed)."""
    c = jax.lax.iota(jnp.int32, n1)
    b = jax.lax.iota(jnp.int32, n2)
    bc = c[:, None] * b[None, :]
    ang = (2.0 * np.pi / (n1 * n2)) * bc.astype(jnp.float32)
    sign = 1.0 if inverse else -1.0
    return jnp.cos(ang), sign * jnp.sin(ang)


def _fft1_fast(xr, xi, inverse: bool):
    """Batched 1-D DFT along the LAST axis via the Bailey 4-step
    factorization: with ``n = n1 n2``, index ``m = n2 a + b``,
    ``k = c + n1 d``::

        X[c + n1 d] = sum_b W_N^{bc} W_{n2}^{bd} (sum_a x[n2 a + b] W_{n1}^{ac})

    i.e. a [n1 x n1] matmul, an elementwise twiddle, and a [n2 x n2]
    matmul — ``O(n (n1 + n2))`` instead of ``O(n^2)`` per row (42x fewer
    MXU flops at n = 8192). Falls back to the direct DFT matrix when n
    doesn't factor nicely. The inverse is the forward of the conjugate,
    conjugated and 1/N-scaled."""
    if inverse:
        yr, yi = _fft1_fast(xr, -xi, inverse=False)
        n = xr.shape[-1]
        return yr * (1.0 / n), yi * (-1.0 / n)
    *batch, n = xr.shape
    split = _split_n(n)
    if split is None:
        c, s = dft_mats(n, False)
        # x @ F^T; F symmetric
        return _cmatmul(xr, xi, c, s)
    n1, n2 = split
    m = int(np.prod(batch)) if batch else 1
    # M[a, b] with n = n2 a + b -> reshape rows-major
    Mr = xr.reshape(m, n1, n2)
    Mi = xi.reshape(m, n1, n2)
    F1c, F1s = dft_mats(n1, False)
    F2c, F2s = dft_mats(n2, False)
    # step 1: T1[c, b] = sum_a F1[c, a] M[a, b]  (fold batch into cols)
    M2r = jnp.transpose(Mr, (1, 0, 2)).reshape(n1, m * n2)
    M2i = jnp.transpose(Mi, (1, 0, 2)).reshape(n1, m * n2)
    T1r, T1i = _cmatmul(F1c, F1s, M2r, M2i)
    # step 2: twiddle W_N^{bc}
    twc, tws = _twiddle(n1, n2, False)
    T1r = T1r.reshape(n1, m, n2)
    T1i = T1i.reshape(n1, m, n2)
    T2r = T1r * twc[:, None, :] - T1i * tws[:, None, :]
    T2i = T1r * tws[:, None, :] + T1i * twc[:, None, :]
    # step 3: X_mat[c, d] = sum_b T2[c, b] F2[d, b]  (F2 symmetric)
    T3r = T2r.reshape(n1 * m, n2)
    T3i = T2i.reshape(n1 * m, n2)
    Xr, Xi = _cmatmul(T3r, T3i, F2c, F2s)
    # k = c + n1 d: output laid out [c, m, d] -> [m, d, c] -> [m, n]
    Xr = jnp.transpose(Xr.reshape(n1, m, n2), (1, 2, 0)).reshape(m, n)
    Xi = jnp.transpose(Xi.reshape(n1, m, n2), (1, 2, 0)).reshape(m, n)
    return Xr.reshape(*batch, n), Xi.reshape(*batch, n)


def _apply2d(xr, xi, inverse: bool):
    # last axis, then transpose so the y axis is last, then transpose back
    yr, yi = _fft1_fast(xr, xi, inverse)
    yr, yi = yr.T, yi.T
    zr, zi = _fft1_fast(yr, yi, inverse)
    return zr.T, zi.T


def fft2_mm(xr, xi=None):
    """Forward 2-D DFT of a [ny, nx] field; returns (real, imag)."""
    if xi is None:
        xi = jnp.zeros_like(xr)
    return _apply2d(xr, xi, inverse=False)


def ifft2_mm(xr, xi):
    """Inverse 2-D DFT (1/(ny*nx) normalized); returns (real, imag)."""
    return _apply2d(xr, xi, inverse=True)
