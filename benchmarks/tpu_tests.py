"""Hardware-gated tests that need the real TPU (skipped elsewhere).

The main suite (tests/) runs on a virtual-CPU mesh where Pallas executes in
interpret mode and ``pltpu.prng_random_bits`` is substituted by a hash-based
stand-in (ops/fused.py::_normal_from_hash). These tests validate the pieces
only real hardware exercises. Run in a TPU bench session:

    python -m pytest benchmarks/tpu_tests.py -q
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs real TPU hardware")


def _kernel_normals(seed: int, shape):
    """Standard normals from the on-core TPU PRNG (prng_random_bits +
    Box-Muller), exactly as the stochastic kernels draw them."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from lb2d_tpu.ops.fused import _normal_from_bits

    def kernel(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0, 0])
        out_ref[:] = _normal_from_bits(shape)

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return np.asarray(call(jnp.asarray(seed, jnp.int32).reshape(1, 1)))


@requires_tpu
def test_oncore_prng_moments():
    """Mean/sigma/kurtosis of the hardware-PRNG normals match N(0,1) within
    sampling error (n = 128k: sigma_mean ~ 0.0028)."""
    eta = _kernel_normals(1234, (1024, 128))
    n = eta.size
    assert np.isfinite(eta).all()
    assert abs(eta.mean()) < 5.0 / np.sqrt(n), eta.mean()
    assert abs(eta.std() - 1.0) < 5.0 / np.sqrt(n), eta.std()
    # excess kurtosis of a normal is 0 (se ~ sqrt(24/n) ~ 0.014)
    kurt = ((eta - eta.mean()) ** 4).mean() / eta.var() ** 2 - 3.0
    assert abs(kurt) < 10 * np.sqrt(24.0 / n), kurt


@requires_tpu
def test_oncore_prng_decorrelated():
    """Lag-1 spatial correlation ~ 0 within a draw; independent seeds give
    independent fields; the same seed reproduces bit-identically."""
    a = _kernel_normals(1, (512, 128))
    b = _kernel_normals(2, (512, 128))
    a2 = _kernel_normals(1, (512, 128))
    np.testing.assert_array_equal(a, a2)     # deterministic per seed
    flat = a.ravel()
    lag1 = np.corrcoef(flat[:-1], flat[1:])[0, 1]
    assert abs(lag1) < 5.0 / np.sqrt(flat.size - 1), lag1
    lagrow = np.corrcoef(a[:-1].ravel(), a[1:].ravel())[0, 1]
    assert abs(lagrow) < 5.0 / np.sqrt(a[:-1].size), lagrow
    cross = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert abs(cross) < 5.0 / np.sqrt(a.size), cross


@requires_tpu
def test_noisy_kernel_sigma_matches_jax_random():
    """The temporal noisy-Fisher kernel's density fluctuation amplitude
    matches the jax.random XLA path (distribution-level check; different
    realizations). Automates the one-off sigma cross-check from RESULTS.md."""
    from functools import partial

    from lb2d_tpu.models.base import _run_loop
    from lb2d_tpu.models.waves import NoisyAdvectedFisherWave

    def sigma(force_xla):
        sim = NoisyAdvectedFisherWave(N=127, z=0.1, D=1.0, g=50.0, Nc=10.0,
                                      Lx=0.202, Ly=0.202)  # 256^2
        if force_xla:
            sim._step = sim._make_xla_stochastic_step()
            sim._run_compiled = jax.jit(partial(_run_loop, sim._step),
                                        donate_argnums=0)
            sim.steps_per_call = 1
        else:
            assert getattr(sim, "steps_per_call", 1) > 1, "kernel not picked"
        sim.run(getattr(sim, "steps_per_call", 1))
        rho = np.asarray(jnp.sum(sim.state[0], axis=0))
        return rho.std()

    s_kernel = sigma(False)
    s_xla = sigma(True)
    assert abs(s_kernel - s_xla) / s_xla < 0.05, (s_kernel, s_xla)


@requires_tpu
def test_pallas_screened_solve_matches_mm_compiled():
    """Compiled-mode (Mosaic, not interpret) parity of the Pallas 4-step
    screened-gradient solve vs the matmul-DFT path — the interpret-mode
    parity lives in tests/test_dft_pallas.py; this covers the real
    compiler (layout choices, DMA alignment, MXU precision flags)."""
    from lb2d_tpu.ops.dft import screened_gradients_mm
    from lb2d_tpu.ops.dft_pallas import (
        screened_gradients_pl, supports_pallas_solve)

    ny = nx = 1024
    assert supports_pallas_solve(ny, nx)
    rs = np.random.RandomState(7)
    rho = jnp.asarray(rs.rand(ny, nx).astype(np.float32))
    fx = jnp.asarray((np.fft.fftfreq(nx) * nx).astype(np.float32))
    fy = jnp.asarray((np.fft.fftfreq(ny) * ny).astype(np.float32))
    gx = np.asarray(fx).copy(); gx[nx // 2] = 0.0
    gy = np.asarray(fy).copy(); gy[ny // 2] = 0.0
    lam2 = np.float32(100.0)
    args = (rho, fx, fy, jnp.asarray(gx), jnp.asarray(gy), lam2)
    a = jax.jit(screened_gradients_pl)(*args)
    b = jax.jit(screened_gradients_mm)(*args)
    sc = float(jnp.max(jnp.abs(b[0])))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               atol=1e-4 * sc)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                               atol=1e-4 * sc)
