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
    """(ar + i ai) @ (br + i bi) with f32 MXU accumulation."""
    mm = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    return mm(ar, br) - mm(ai, bi), mm(ar, bi) + mm(ai, br)


def _apply2d(xr, xi, inverse: bool):
    ny, nx = xr.shape
    cy, sy = dft_mats(ny, inverse)
    cx, sx = dft_mats(nx, inverse)
    # rows: F_y @ X
    yr, yi = _cmatmul(cy, sy, xr, xi)
    # cols: (.) @ F_x^T ; DFT matrix is symmetric so F_x^T = F_x
    return _cmatmul(yr, yi, cx, sx)


def fft2_mm(xr, xi=None):
    """Forward 2-D DFT of a [ny, nx] field; returns (real, imag)."""
    if xi is None:
        xi = jnp.zeros_like(xr)
    return _apply2d(xr, xi, inverse=False)


def ifft2_mm(xr, xi):
    """Inverse 2-D DFT (1/(ny*nx) normalized); returns (real, imag)."""
    return _apply2d(xr, xi, inverse=True)
