"""Fused Pallas kernel parity tests (interpret mode on CPU).

Both fused kernels must reproduce the XLA-path step (itself verified against
the numpy two-buffer oracle in test_pipe_flow.py) to float32 roundoff.
"""

import numpy as np
import pytest

from lb2d_tpu.models.pipe_flow import PipeFlow
from lb2d_tpu.ops.fused import (
    make_fused_pipe_step,
    make_pipelined_pipe_step,
    supports_fused,
    supports_pipelined,
)

PHYS = dict(diameter=1.0, rho=10.0, viscosity=5.0, pressure_grad=-100.0)


def _sim(ny=32, nx=128, **kw):
    # grid (ny, nx): N = ny-1, pipe_length chosen for lx = nx-1
    N = ny - 1
    return PipeFlow(N=N, pipe_length=(nx - 1.5) / N, backend="xla",
                    **PHYS, **kw)


def _compare(step_a, step_b, f0, n=4, atol=5e-7):
    a = b = f0
    for _ in range(n):
        a = step_a(a)
        b = step_b(b)
    d = float(np.abs(np.asarray(a) - np.asarray(b)).max())
    assert d < atol, d


def test_support_gating():
    assert supports_fused(4096, 4096)
    assert supports_pipelined(4096, 4096)
    assert not supports_fused(31, 61)        # unaligned lanes
    assert not supports_pipelined(4096, 4100)
    assert not supports_pipelined(24, 128)   # fewer chunks than ring slots


def test_blocked_kernel_matches_xla():
    sim = _sim()
    fused = make_fused_pipe_step(
        ny=sim.ny, nx=sim.nx, omega=sim.omega, inlet_rho=sim.inlet_rho,
        outlet_rho=sim.outlet_rho, interpret=True)
    _compare(sim.make_step(), fused, sim.state)


def test_pipelined_kernel_matches_xla():
    sim = _sim()
    pipe = make_pipelined_pipe_step(
        ny=sim.ny, nx=sim.nx, omega=sim.omega, inlet_rho=sim.inlet_rho,
        outlet_rho=sim.outlet_rho, interpret=True)
    _compare(sim.make_step(), pipe, sim.state)


def test_pipelined_with_obstacle_matches_xla():
    mask = np.zeros((32, 128), np.int32)
    mask[10:20, 40:60] = 1
    sim = _sim(obstacle_mask=mask)
    import jax.numpy as jnp

    pipe = make_pipelined_pipe_step(
        ny=sim.ny, nx=sim.nx, omega=sim.omega, inlet_rho=sim.inlet_rho,
        outlet_rho=sim.outlet_rho, has_obstacle=True, interpret=True)
    mask_j = jnp.asarray(mask)
    _compare(sim.make_step(), lambda f: pipe(f, mask_j), sim.state)


def test_incompressible_pipelined_matches_xla():
    sim = _sim(equilibrium="incompressible")
    pipe = make_pipelined_pipe_step(
        ny=sim.ny, nx=sim.nx, omega=sim.omega, inlet_rho=sim.inlet_rho,
        outlet_rho=sim.outlet_rho, equilibrium="incompressible",
        interpret=True)
    _compare(sim.make_step(), pipe, sim.state)


@pytest.mark.parametrize("K", [2, 3, 4])
def test_temporal_kernel_matches_k_steps(K):
    sim = _sim(ny=128, nx=128)
    from lb2d_tpu.ops.fused import make_temporal_pipe_step

    tK = make_temporal_pipe_step(
        ny=sim.ny, nx=sim.nx, omega=sim.omega, inlet_rho=sim.inlet_rho,
        outlet_rho=sim.outlet_rho, interpret=True, k_steps=K)
    step = sim.make_step()

    def k_xla(f):
        for _ in range(K):
            f = step(f)
        return f

    _compare(k_xla, tK, sim.state, n=2)


def test_temporal_backend_odd_steps():
    """backend='temporal' advances k_steps (default 6) per sweep; counts that
    are not multiples must use the single-step remainder and match the XLA
    path exactly."""
    a = _sim(ny=160, nx=128)
    b = _sim(ny=160, nx=128)
    b.backend = "temporal"
    b._step = b.make_step()
    import jax
    from functools import partial
    from lb2d_tpu.models.base import _run_loop
    b._run_compiled = jax.jit(partial(_run_loop, b._step), donate_argnums=0)
    assert b.steps_per_call == 6
    a.run(8)   # one sweep of 6 + 2 single-step remainders
    b.run(8)
    assert b.steps_taken == 8
    d = float(np.abs(np.asarray(a.state) - np.asarray(b.state)).max())
    assert d < 1e-6, d


def test_temporal_obstacle_matches_xla():
    mask = np.zeros((160, 128), np.int32)
    mask[60:90, 40:70] = 1
    sim = _sim(ny=160, nx=128, obstacle_mask=mask)
    import jax.numpy as jnp
    from lb2d_tpu.ops.fused import make_temporal_pipe_step

    t3 = make_temporal_pipe_step(
        ny=sim.ny, nx=sim.nx, omega=sim.omega, inlet_rho=sim.inlet_rho,
        outlet_rho=sim.outlet_rho, has_obstacle=True, interpret=True,
        k_steps=3)
    mask_j = jnp.asarray(mask)
    step = sim.make_step()

    def k_xla(f):
        for _ in range(3):
            f = step(f)
        return f

    _compare(k_xla, lambda f: t3(f, mask_j), sim.state, n=2)


def test_padded_temporal_matches_xla():
    """Unaligned flow grids run the temporal kernel on an edge-padded array;
    the physical region must match the XLA path exactly."""
    import jax.numpy as jnp

    PH = dict(diameter=1.0, rho=10.0, viscosity=5.0, pressure_grad=-100.0)
    a = PipeFlow(N=149, pipe_length=(200 - 1.5) / 149, backend="xla", **PH)
    assert (a.ny, a.nx) == (150, 200)
    b = PipeFlow(N=149, pipe_length=(200 - 1.5) / 149, backend="xla", **PH)
    b.backend = "temporal"
    b._pad_dims = (160, 256)
    b.state = jnp.pad(b.state, ((0, 0), (0, 10), (0, 56)), mode="edge")
    stepK = b._make_temporal_step(6)
    step = a.make_step()
    fa = a.state
    for _ in range(6):
        fa = step(fa)
    fb = stepK(b.state)
    d = float(np.abs(np.asarray(fa) - np.asarray(fb)[:, :150, :200]).max())
    assert d < 1e-6, d
    # the remainder path (slice -> xla -> re-pad) must also match
    b.state = fb
    b._step = stepK
    import jax
    from functools import partial
    from lb2d_tpu.models.base import _run_loop
    b._run_compiled = jax.jit(partial(_run_loop, stepK), donate_argnums=0)
    fa2 = step(fa)
    b.run(1)
    d2 = float(np.abs(np.asarray(fa2)
                      - np.asarray(b.state)[:, :150, :200]).max())
    assert d2 < 1e-6, d2


def test_resident_kernel_matches_xla():
    """Grid-resident kernel (whole state in VMEM, n steps per launch)
    == n applications of the XLA step, including Zou-He + walls/corners."""
    from lb2d_tpu.ops.fused import make_resident_pipe_step, supports_resident

    assert supports_resident(32, 128)
    assert not supports_resident(31, 128)      # sublane-unaligned
    assert not supports_resident(4096, 4096)   # too big for VMEM
    sim = _sim()
    res = make_resident_pipe_step(
        ny=sim.ny, nx=sim.nx, omega=sim.omega, inlet_rho=sim.inlet_rho,
        outlet_rho=sim.outlet_rho, interpret=True)
    step = sim.make_step()
    # n = 11 crosses the unrolled block (auto U=8 at this size) AND the
    # remainder loop
    f = sim.state
    for _ in range(11):
        f = step(f)
    out = res(sim.state, 11)
    d = float(np.abs(np.asarray(out) - np.asarray(f)).max())
    assert d < 5e-7, d
    # n = 0 is the warm-up path: must be identity
    out0 = res(sim.state, 0)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(sim.state))


def test_resident_kernel_obstacle_and_incompressible():
    from lb2d_tpu.ops.fused import make_resident_pipe_step
    import jax.numpy as jnp

    mask = np.zeros((32, 128), np.int32)
    mask[10:20, 40:60] = 1
    sim = _sim(obstacle_mask=mask, equilibrium="incompressible")
    res = make_resident_pipe_step(
        ny=sim.ny, nx=sim.nx, omega=sim.omega, inlet_rho=sim.inlet_rho,
        outlet_rho=sim.outlet_rho, equilibrium="incompressible",
        has_obstacle=True, interpret=True)
    step = sim.make_step()
    f = sim.state
    for _ in range(4):
        f = step(f)
    out = res(sim.state, 4, jnp.asarray(mask))
    d = float(np.abs(np.asarray(out) - np.asarray(f)).max())
    assert d < 5e-7, d


def test_resident_backend_end_to_end():
    """backend='resident' through the model API: run(n) is one launch and
    matches the XLA backend bit-close."""
    a = _sim()
    b = PipeFlow(N=31, pipe_length=(128 - 1.5) / 31, backend="resident",
                 **PHYS)
    a.run(7)
    b.run(7)
    assert b.steps_taken == 7
    d = float(np.abs(np.asarray(a.state) - np.asarray(b.state)).max())
    assert d < 1e-6, d


def test_lattice_pipe_flow_resident_backend():
    """LatticePipeFlow (OLD lattice-units API) through the resident
    kernel matches its XLA backend."""
    from lb2d_tpu.models.lattice_units import LatticePipeFlow

    kw = dict(omega=1.2, lx=127, ly=31, deltaP=-0.01)
    a = LatticePipeFlow(backend="xla", **kw)
    b = LatticePipeFlow(backend="resident", **kw)
    assert (b.ny, b.nx) == (32, 128)
    a.run(9)
    b.run(9)
    d = float(np.abs(np.asarray(a.state) - np.asarray(b.state)).max())
    assert d < 1e-6, d
