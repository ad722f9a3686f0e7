"""Multicomponent/porous engine tests: Darcy balance, Shan-Chen separation,
conservation, eating/growth hooks, D2Q25, zero-gradient BCs."""

import numpy as np
import pytest

from lb2d_tpu.core.lattice import D2Q25
from lb2d_tpu.models.multicomponent import (
    Fluid,
    SECOND_BELT_STENCIL,
    SimulationRunner,
)


def _runner(C=1, porous=True, lattice=None, nx=32, ny=32):
    kw = dict(nx=nx, ny=ny, L_lb=nx, T_lb=1.0, num_populations=C,
              porous=porous)
    if lattice is not None:
        kw["lattice"] = lattice
    return SimulationRunner(**kw)


def test_second_belt_stencil_props():
    # 8 first-belt + 16 second-belt vectors (single_component.py:533-646)
    assert len(SECOND_BELT_STENCIL) == 24
    # isotropy: sum w c = 0
    sx = sum(w * c[0] for w, c in SECOND_BELT_STENCIL)
    sy = sum(w * c[1] for w, c in SECOND_BELT_STENCIL)
    assert abs(sx) < 1e-14 and abs(sy) < 1e-14


def test_porous_darcy_balance():
    """Constant body force balanced by Darcy drag: steady u = g K / nu_f
    for small velocity (single_component.cl:317-325)."""
    sim = _runner(C=1, porous=True)
    fl = Fluid(sim, 0, nu_e=0.5, epsilon=0.8, nu_fluid=0.4, K=2.0, Fe=0.0)
    sim.add_fluid(fl)
    sim.complete_setup()
    fl.initialize(np.ones((sim.ny, sim.nx)))
    g = 1e-5
    sim.add_constant_body_force(0, g, 0.0)
    sim.run(3000)
    u = sim.get_fields()["u_bary"]
    expected = g * 2.0 / 0.4
    assert np.allclose(u, expected, rtol=0.05), (u.mean(), expected)


def test_mass_conservation_periodic():
    sim = _runner(C=2, porous=False)
    for i in range(2):
        sim.add_fluid(Fluid(sim, i, nu_e=0.4, epsilon=1.0))
    sim.complete_setup()
    rng = np.random.RandomState(0)
    sim.fluid_list[0].initialize(1.0 + 0.1 * rng.rand(sim.ny, sim.nx))
    sim.fluid_list[1].initialize(1.0 + 0.1 * rng.rand(sim.ny, sim.nx))
    m0 = [float(np.sum(sim.get_fields()["rho"][:, :, i])) for i in range(2)]
    sim.run(300)
    rho = sim.get_fields()["rho"]
    for i in range(2):
        assert np.sum(rho[:, :, i]) == pytest.approx(m0[i], rel=1e-4)


def test_shan_chen_separation():
    """Two mutually repelling fluids phase-separate: densities anticorrelate
    and interfaces sharpen (the multicomponent_test.ipynb workload)."""
    sim = _runner(C=2, porous=False, nx=32, ny=32)
    for i in range(2):
        sim.add_fluid(Fluid(sim, i, nu_e=1.0 / 6.0, epsilon=1.0))
    sim.complete_setup()
    rng = np.random.RandomState(1)
    base = 0.5 + 0.05 * rng.rand(sim.ny, sim.nx)
    sim.fluid_list[0].initialize(base)
    sim.fluid_list[1].initialize(1.0 - base)
    sim.add_interaction_force(0, 1, G_int=1.8, potential="linear")
    std0 = float(sim.get_fields()["rho"][:, :, 0].std())
    sim.run(400)
    rho = sim.get_fields()["rho"]
    r0, r1 = rho[:, :, 0], rho[:, :, 1]
    assert np.isfinite(rho).all()
    corr = np.corrcoef(r0.ravel(), r1.ravel())[0, 1]
    assert corr < -0.5, corr
    # contrast grew strongly (domains formed): std 0.0005 -> ~0.7
    assert r0.std() > 20 * std0, (std0, r0.std())


def test_eating_conserves_total():
    sim = _runner(C=2, porous=False)
    for i in range(2):
        sim.add_fluid(Fluid(sim, i, nu_e=0.4))
    sim.complete_setup()
    sim.fluid_list[0].initialize(0.5 * np.ones((sim.ny, sim.nx)))
    sim.fluid_list[1].initialize(1.0 * np.ones((sim.ny, sim.nx)))
    sim.add_eating_rate(0, 1, rate=1e-3)
    m_eater0 = float(np.sum(sim.get_fields()["rho"][:, :, 0]))
    tot0 = float(np.sum(sim.get_fields()["rho"]))
    sim.run(200)
    rho = sim.get_fields()["rho"]
    assert np.sum(rho[:, :, 0]) > m_eater0          # eater grows
    assert np.sum(rho) == pytest.approx(tot0, rel=1e-4)  # total conserved (fp32)


def test_growth_hook():
    sim = _runner(C=1, porous=False)
    sim.add_fluid(Fluid(sim, 0, nu_e=0.4))
    sim.complete_setup()
    sim.fluid_list[0].initialize(0.5 * np.ones((sim.ny, sim.nx)))
    sim.add_growth(0, min_rho_cutoff=0.1, max_rho_cutoff=10.0, eat_rate=1e-3)
    m0 = float(np.sum(sim.get_fields()["rho"]))
    sim.run(100)
    assert float(np.sum(sim.get_fields()["rho"])) > m0


def test_zero_gradient_bc_runs():
    sim = _runner(C=1, porous=True)
    fl = Fluid(sim, 0, nu_e=0.5, bc="zero_gradient")
    sim.add_fluid(fl)
    sim.complete_setup()
    rho0 = np.ones((sim.ny, sim.nx))
    rho0[10:20, 10:20] = 2.0
    fl.initialize(rho0)
    sim.run(100)
    rho = sim.get_fields()["rho"][:, :, 0]
    assert np.isfinite(rho).all()
    # zero-gradient edges track their interior neighbors
    np.testing.assert_allclose(rho[0, 1:-1], rho[1, 1:-1], rtol=1e-3)


def test_d2q25_runner():
    sim = _runner(C=1, porous=False, lattice=D2Q25)
    sim.add_fluid(Fluid(sim, 0, nu_e=0.5))
    sim.complete_setup()
    rng = np.random.RandomState(2)
    sim.fluid_list[0].initialize(1.0 + 0.05 * rng.rand(sim.ny, sim.nx))
    m0 = float(np.sum(sim.get_fields()["rho"]))
    sim.run(100)
    rho = sim.get_fields()["rho"]
    assert rho.shape[-1] == 1 and sim.f.shape[0] == 25
    assert np.isfinite(rho).all()
    assert np.sum(rho) == pytest.approx(m0, rel=1e-5)


def test_screened_poisson_force_hook():
    sim = _runner(C=2, porous=False)
    for i in range(2):
        sim.add_fluid(Fluid(sim, i, nu_e=0.4))
    sim.complete_setup()
    rng = np.random.RandomState(3)
    blob = np.zeros((sim.ny, sim.nx))
    blob[12:20, 12:20] = 1.0
    sim.fluid_list[0].initialize(0.5 + blob)
    sim.fluid_list[1].initialize(np.ones((sim.ny, sim.nx)))
    sim.add_screened_poisson_force(source_index=0, force_index=1,
                                   interaction_length=2.0, amplitude=1e-3)
    sim.run(50)
    assert np.isfinite(sim.get_fields()["rho"]).all()
