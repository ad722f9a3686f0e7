"""Golden tests for the nondimensionalization layer.

Expected values are the printed outputs preserved in the reference notebook
``docs/opencl_dimensionless_verification.ipynb`` cells 7/9/10: L = 1.5,
T = 0.387298334621, W = 1.16189500386, omega = 0.324465802203,
u_lb = 0.1/0.02/0.005 and inlet rho = 1.063 / 1.002424 / 1.000150375
for N = 10/50/200.
"""

import pytest

from lb2d_tpu.core.nondim import FlowUnits, omega_from_lb_visc

PARAMS = dict(diameter=1.5, rho=10.0, viscosity=5.0, pressure_grad=-100.0,
              pipe_length=3.0)


@pytest.mark.parametrize(
    "N,ulb,inlet_rho",
    [(10, 0.1, 1.063), (50, 0.02, 1.002424), (200, 0.005, 1.000150375)],
)
def test_flow_units_golden(N, ulb, inlet_rho):
    u = FlowUnits(N=N, time_prefactor=1.0, convention="W", **PARAMS)
    assert abs(u.L - 1.5) < 1e-12
    assert abs(u.T - 0.387298334621) < 1e-9
    assert abs(u.dimensionless_group - 1.16189500386) < 1e-9
    assert abs(u.omega - 0.324465802203) < 1e-9
    assert abs(u.ulb - ulb) < 1e-12
    nx, ny = u.grid_dims()
    assert ny == N + 1
    got_inlet, got_outlet = u.inlet_outlet_rho(nx)
    assert got_outlet == 1.0
    assert abs(got_inlet - inlet_rho) < 1e-9


def test_grid_dims_golden():
    u = FlowUnits(N=10, **PARAMS)
    # lx = ceil((pipe_length/L)*N) = ceil(2*10) = 20 -> nx = 21
    assert u.grid_dims() == (21, 11)


def test_omega_is_resolution_independent():
    omegas = {FlowUnits(N=n, **PARAMS).omega for n in (10, 50, 200)}
    assert max(omegas) - min(omegas) < 1e-12


def test_unstable_omega_raises():
    with pytest.raises(ValueError):
        omega_from_lb_visc(-0.1)


def test_re_convention():
    # python_dim.py:61-81: T = 8*rho*nu/(|gradP|*L), Re = L^2/(nu T^2)
    u = FlowUnits(N=50, convention="Re", **PARAMS)
    T = 8 * 10.0 * 5.0 / (100.0 * 1.5)
    assert abs(u.T - T) < 1e-12
    Re = 1.5**2 / (5.0 * T**2)
    assert abs(u.dimensionless_group - Re) < 1e-12
    assert u.omega < 2.0
