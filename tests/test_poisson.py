"""Poisson solver tests: steady-state PDE residual, Dirichlet walls,
convergence semantics, gradient-axis quirk, and the spectral solver vs a
numpy oracle."""

import numpy as np
import pytest

from lb2d_tpu.models.poisson import PoissonSolver
from lb2d_tpu.models.spectral import ScreenedPoisson, screened_poisson_solve


def _laplacian5(a):
    return (a[:-2, 1:-1] + a[2:, 1:-1] + a[1:-1, :-2] + a[1:-1, 2:]
            - 4 * a[1:-1, 1:-1])


def test_poisson_uniform_source():
    """Steady state of the Chai-Shi scheme satisfies
    ``lap_cells rho = -(1 - w0) * S * D_lb * dt^2``: the per-step source is
    double-scaled per the reference (see module docstring) and the effective
    diffusivity carries the (1 - w0) = 5/9 factor because density is
    recovered from the non-rest populations only (D2Q9_poisson.cl:59)."""
    nx = ny = 32
    delta_x, delta_t = 1.0 / 30, (1.0 / 30) ** 2
    S = np.ones((ny, nx), np.float32)
    solver = PoissonSolver(nx=nx, ny=ny, sources=S, delta_t=delta_t,
                           delta_x=delta_x, tolerance=1e-7)
    solver.run(20000)
    assert solver.converged
    rho = np.asarray(solver.rho)
    lap = _laplacian5(rho)
    expected = -(5.0 / 9.0) * solver.lb_D * delta_t**2
    # deep-interior residual (cells adjacent to the Dirichlet wall carry the
    # discrete-BC error; fp32 + tol=1e-7 leaves a few-percent tail)
    deep = lap[3:-3, 3:-3]
    assert np.abs(deep - expected).max() < 0.15 * abs(expected), (
        np.abs(deep - expected).max() / abs(expected))
    assert abs(deep.mean() - expected) < 0.05 * abs(expected)


def test_poisson_dirichlet_walls():
    nx = ny = 24
    solver = PoissonSolver(nx=nx, ny=ny, sources=np.ones((ny, nx)),
                           delta_t=1e-3, delta_x=0.05, rho_on_boundary=0.25,
                           tolerance=1e-7)
    solver.run(20000)
    rho = np.asarray(solver.rho)
    for edge in (rho[0, 1:-1], rho[-1, 1:-1], rho[1:-1, 0], rho[1:-1, -1]):
        np.testing.assert_allclose(edge, 0.25, atol=2e-3)


def test_poisson_gradient_axis_quirk():
    """u holds the y-derivative and v the x-derivative
    (D2Q9_poisson.cl:294-304) — pinned directly on the pure function."""
    from lb2d_tpu.models.poisson import negative_gradient

    ny, nx = 16, 24
    rho = np.broadcast_to((np.arange(ny)[:, None]).astype(np.float32),
                          (ny, nx)).copy()  # varies only in y, slope 1
    u, v = negative_gradient(rho, delta_x=0.5)
    u, v = np.asarray(u), np.asarray(v)
    # interior: u = -(rho[y+1]-rho[y-1])/(2*delta_x) = -2/(2*0.5) = -2
    np.testing.assert_allclose(u[1:-1, :], -2.0, atol=1e-6)
    np.testing.assert_allclose(v[1:-1, 1:-1], 0.0, atol=1e-6)
    # zero-padded edges (D2Q9_poisson.cl:283-296): one-sided values differ
    assert not np.allclose(u[0, :], u[1, :])


def test_poisson_warm_restart():
    nx = ny = 24
    solver = PoissonSolver(nx=nx, ny=ny, sources=np.ones((ny, nx)),
                           delta_t=1e-3, delta_x=0.05, tolerance=1e-6)
    solver.run(20000)
    n1 = solver.num_iterations
    # update_source keeps rho, resets the counter (solver.py:152-161)
    solver.update_source(np.ones((ny, nx)) * 1.001)
    assert solver.num_iterations == 0
    solver.run(20000)
    assert solver.num_iterations < n1  # warm start converges faster


# ---------------------------------------------------------------------------
# spectral screened Poisson
# ---------------------------------------------------------------------------

def _numpy_oracle(charge, lam, dx):
    """Independent numpy implementation of the reference pipeline
    (screened_poisson.py:18-89)."""
    nx_, ny_ = charge.shape[1], charge.shape[0]
    fx = (nx_ * dx) * np.fft.fftfreq(nx_, d=dx)
    fy = (ny_ * dx) * np.fft.fftfreq(ny_, d=dx)
    KX = fx[None, :]
    KY = fy[:, None]
    chat = np.fft.fft2(charge) / (lam**2 * (KX**2 + KY**2) + 1.0)
    xg = np.fft.ifft2(chat * 2j * np.pi * KX)
    yg = np.fft.ifft2(chat * 2j * np.pi * KY)
    return np.fft.ifft2(chat), xg, yg


def test_screened_poisson_single_mode():
    ny, nx = 32, 64
    k = 3
    x = np.arange(nx)
    charge = np.broadcast_to(np.cos(2 * np.pi * k * x / nx)[None, :],
                             (ny, nx)).astype(np.float32)
    lam = 0.7
    phi, xg, yg = screened_poisson_solve(charge, lam=lam, dx=1.0)
    expected = charge / (lam**2 * k**2 + 1.0)
    np.testing.assert_allclose(np.asarray(phi.real), expected, atol=1e-4)
    np.testing.assert_allclose(np.asarray(yg.real), 0.0, atol=1e-3)


def test_screened_poisson_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    charge = rng.randn(24, 40).astype(np.float32)
    lam, dx = 1.3, 0.5
    phi, xg, yg = screened_poisson_solve(charge, lam=lam, dx=dx)
    ophi, oxg, oyg = _numpy_oracle(charge, lam, dx)
    np.testing.assert_allclose(np.asarray(phi), ophi.astype(np.complex64),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(xg), oxg.astype(np.complex64),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(yg), oyg.astype(np.complex64),
                               atol=1e-3)


def test_screened_poisson_class_api():
    charge = np.ones((16, 16), np.float32)
    sp = ScreenedPoisson(charge, lam=1.0, dx=1.0)
    sp.create_grad_fields()
    sp.solve_and_update_grad_fields()
    # uniform charge: only k=0 survives -> phi = charge, gradients = 0
    sp.inverse_fft()
    np.testing.assert_allclose(np.asarray(sp.charge.real), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sp.xgrad.real), 0.0, atol=1e-5)
