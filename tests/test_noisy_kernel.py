"""In-kernel PRNG (noisy_fisher temporal kernel) tests.

The TPU path draws normals from ``pltpu.prng_random_bits``; in interpret
mode the kernel substitutes a counter-hash PRNG with the same distribution
(``lb2d_tpu.ops.fused._normal_from_hash``), so these tests exercise the full
kernel + seam-patch pipeline on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lb2d_tpu.models.diffusion import ReactionAdvectionDiffusionStochastic
from lb2d_tpu.models.waves import NoisyAdvectedFisherWave


def _wave(**over):
    # grid 128x128: N*int(Lx/z) = 63*2 = 126, +2 ring
    kw = dict(N=63, z=0.1, Lx=0.21, Ly=0.21, D=1.0, g=1.0, Nc=10.0,
              vx=1.0, vy=0.5, vc=1.0)
    kw.update(over)
    return NoisyAdvectedFisherWave(**kw)


def test_noisy_temporal_dg0_matches_xla():
    """With Dg=0 the noise term vanishes identically, so the kernel must
    reproduce the deterministic trajectory bit-for-bit (seam patch
    included) regardless of how the two paths consume their keys."""
    sim = _wave(Nc=np.inf)  # Dg = (1/Nc)(z/D) = 0
    assert sim.lb_Dg == 0.0
    stepK = sim._make_noisy_temporal_step(2, interpret=True)
    xla = sim._make_xla_stochastic_step()
    a = b = sim.state
    for _ in range(2):
        b = stepK(b)
        a = xla(xla(a))
    d = float(jnp.abs(a[0] - b[0]).max())
    assert d < 1e-6, d


def test_noisy_temporal_statistics():
    """Noise applied in-kernel has the right magnitude: from a uniform
    rho=0.5 state, one K=2 sweep adds per-cell density noise with mean ~0
    and std within a loose factor of sqrt(2 Dg rho(1-rho))."""
    sim = _wave()
    Dg = float(sim.lb_Dg)
    assert Dg > 0
    # uniform rho = 0.5 equilibrium state
    w = D2Q9_w = np.asarray(sim.lattice.w_np())
    f0 = jnp.asarray(np.broadcast_to(
        (0.5 * w)[:, None, None], (9, sim.ny, sim.nx)).copy(), jnp.float32)

    stepK = sim._make_noisy_temporal_step(2, interpret=True)
    noisy = stepK((f0, jax.random.PRNGKey(0)))[0]

    det = _wave(Nc=np.inf)
    det_stepK = det._make_noisy_temporal_step(2, interpret=True)
    base = det_stepK((f0, jax.random.PRNGKey(0)))[0]

    diff = np.asarray((noisy - base).sum(0))[8:-8]  # interior rows
    expected = np.sqrt(2 * Dg * 0.25)
    assert abs(diff.mean()) < 0.1 * expected
    assert 0.5 * expected < diff.std() < 2.0 * expected, (
        diff.std(), expected)


def test_noisy_temporal_reproducible_and_seeded():
    sim = _wave()
    stepK = sim._make_noisy_temporal_step(2, interpret=True)
    s1 = stepK(sim.state)
    s2 = stepK(sim.state)
    np.testing.assert_array_equal(np.asarray(s1[0]), np.asarray(s2[0]))
    s3 = stepK((sim.state[0], jax.random.PRNGKey(123)))
    assert not np.array_equal(np.asarray(s1[0]), np.asarray(s3[0]))


def test_noisy_temporal_finite_clipped_and_grows():
    sim = _wave(g=30.0)
    stepK = sim._make_noisy_temporal_step(2, interpret=True)
    state = sim.state
    m0 = float(state[0].sum())
    for _ in range(5):
        state = stepK(state)
    f = np.asarray(state[0])
    assert np.isfinite(f).all()
    assert (f >= 0).all()
    assert f.sum() > m0  # Fisher growth dominates


def test_stochastic_diffusion_temporal_matches_family():
    """Same machinery on ReactionAdvectionDiffusionStochastic (its Dg is the
    raw lattice amplitude, diffusion.py:568)."""
    sim = ReactionAdvectionDiffusionStochastic(
        Lx=0.21, Ly=0.21, z=0.1, N=63, D=1.0, g=1.0, vx=1.0, vy=1.0,
        vc=1.0, Dg=0.0)
    stepK = sim._make_noisy_temporal_step(2, interpret=True)
    xla = sim._make_xla_stochastic_step()
    a = b = sim.state
    for _ in range(2):
        b = stepK(b)
        a = xla(xla(a))
    d = float(jnp.abs(a[0] - b[0]).max())
    assert d < 1e-6, d


def test_seam_noise_spatial_correlation_pinned():
    """Pin DIVERGENCES.md #19 quantitatively: the temporal kernel's
    stitched noise realization decorrelates adjacent-row density
    increments ONLY at the two seam-patch band edges; everywhere else the
    spatial correlation matches the pure jax.random path's structure, and
    the marginal amplitude matches to <2%.

    Method: 48 independent one-sweep (K=2) realizations of the stochastic
    Fisher model with growth off; corr of adjacent-row density increments
    over (replica, lane). Interior pairs carry ~+0.09 correlation (each
    cell's noise streams into its neighbors within the sweep); the patch
    writes rows {ny-2, ny-1, 0, 1} from an independent jax.random stream,
    so only the pairs (1,2) and (ny-3, ny-2) straddle inconsistent
    realizations."""
    import jax
    import jax.numpy as jnp
    from lb2d_tpu.models.diffusion import (
        ReactionAdvectionDiffusionStochastic)

    m = ReactionAdvectionDiffusionStochastic(
        N=126, z=0.1, D=0.005, vx=0.0, vy=0.0, vc=1.0,
        Lx=0.101, Ly=0.101, g=0.0, Dg=0.5)
    ny, nx = m.ny, m.nx
    assert (ny, nx) == (128, 128)
    K = 2
    stepT = jax.jit(m._make_noisy_temporal_step(K, interpret=True))
    stepX = jax.jit(m._make_xla_stochastic_step())
    f0 = m.state[0]
    rho0 = np.asarray(jnp.sum(f0, axis=0))

    M = 48
    dT, dX = [], []
    for i in range(M):
        st = stepT((f0, jax.random.PRNGKey(1000 + i)))
        dT.append(np.asarray(jnp.sum(st[0], axis=0)) - rho0)
        st = (f0, jax.random.PRNGKey(5000 + i))
        for _ in range(K):
            st = stepX(st)
        dX.append(np.asarray(jnp.sum(st[0], axis=0)) - rho0)
    dT = np.stack(dT)
    dX = np.stack(dX)

    # marginal amplitude matches the jax.random path
    assert abs(dT.std() / dX.std() - 1.0) < 0.02

    def rowcorr(d, r):
        a = d[:, r, :].ravel()
        b = d[:, (r + 1) % ny, :].ravel()
        a = a - a.mean()
        b = b - b.mean()
        return float((a * b).mean() / (a.std() * b.std()))

    cT = np.array([rowcorr(dT, r) for r in range(ny)])
    cX = np.array([rowcorr(dX, r) for r in range(ny)])
    seam_pairs = {1, ny - 3}           # band edges: (1,2), (125,126)
    interior = [r for r in range(ny) if r not in seam_pairs]

    # interior structure matches the pure jax.random path
    assert abs(cT[interior].mean() - cX[interior].mean()) < 0.01
    assert cT[interior].min() > 0.03   # no hidden decorrelated pair
    # the two band-edge pairs ARE decorrelated (the documented stitching) —
    # and the wrap pair itself (127, 0) is NOT (the patch is internally a
    # single consistent jax.random realization)
    for r in seam_pairs:
        assert cT[r] < 0.04, (r, cT[r])
    assert cT[ny - 1] > 0.03
