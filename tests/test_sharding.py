"""Multi-chip domain decomposition tests on a virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from lb2d_tpu.models.pipe_flow import PipeFlow
from lb2d_tpu.parallel.sharded import ShardedPipeFlow, make_mesh

PARAMS = dict(diameter=1.5, rho=10.0, viscosity=5.0, pressure_grad=-100.0)


@pytest.fixture(scope="module")
def has8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return True


def test_mesh_factoring(has8):
    mesh = make_mesh(8)
    assert mesh.shape["y"] * mesh.shape["x"] == 8
    mesh = make_mesh(8, shape=(2, 4))
    assert mesh.shape["y"] == 2 and mesh.shape["x"] == 4


def test_sharded_matches_single_device(has8):
    # ny = 16 (N=15) divisible by mesh y=2; nx must divide 4.
    # lx = ceil(pipe_length/L*N): want nx=32 -> lx=31 -> length = 30.5/15*L
    mesh = make_mesh(8, shape=(2, 4))
    kwargs = dict(N=15, pipe_length=1.5 * 30.5 / 15, **PARAMS)
    single = PipeFlow(backend="xla", **kwargs)
    assert (single.ny, single.nx) == (16, 32)
    sharded = ShardedPipeFlow(mesh=mesh, **kwargs)

    single.run(20)
    sharded.run(20)
    a = np.asarray(single.state)
    b = np.asarray(jax.device_get(sharded.state))
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7)


def test_sharded_with_obstacle(has8):
    mesh = make_mesh(8, shape=(2, 4))
    mask = np.zeros((16, 32), np.int32)
    mask[6:10, 12:16] = 1
    kwargs = dict(N=15, pipe_length=1.5 * 30.5 / 15, obstacle_mask=mask, **PARAMS)
    single = PipeFlow(backend="xla", **kwargs)
    sharded = ShardedPipeFlow(mesh=mesh, **kwargs)
    single.run(10)
    sharded.run(10)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(sharded.state)), np.asarray(single.state),
        rtol=1e-6, atol=1e-7)


def test_graft_dryrun(has8):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_multicomponent_gspmd_sharding(has8):
    """SimulationRunner.shard_over: GSPMD-partitioned porous engine matches
    the unsharded run bitwise-close."""
    from lb2d_tpu.models.multicomponent import Fluid, SimulationRunner

    def build():
        sim = SimulationRunner(nx=32, ny=32, L_lb=32, num_populations=2,
                               porous=True)
        for i in range(2):
            sim.add_fluid(Fluid(sim, i, nu_e=0.4, epsilon=0.9, nu_fluid=0.3,
                                K=1.0, Fe=0.1))
        sim.complete_setup()
        rng = np.random.RandomState(0)
        sim.fluid_list[0].initialize(0.5 + 0.05 * rng.rand(32, 32))
        sim.fluid_list[1].initialize(0.5 + 0.05 * rng.rand(32, 32))
        sim.add_interaction_force(0, 1, G_int=0.5, potential="shan_chen",
                                  potential_parameters=[1.0])
        return sim

    a = build()
    b = build()
    b.shard_over(make_mesh(8, shape=(2, 4)))
    a.run(50)
    b.run(50)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(b.f)), np.asarray(a.f),
        rtol=1e-6, atol=1e-7)


class TestTemporalSharded:
    """Pallas temporal kernel inside shard_map (ops/fused_halo.py)."""

    KW = dict(N=255, pipe_length=1.5 * 126.5 / 255, **PARAMS)

    def test_matches_single_device(self, has8):
        mesh = make_mesh(8, shape=(8, 1))
        single = PipeFlow(backend="xla", **self.KW)
        assert (single.ny, single.nx) == (256, 128)
        sh = ShardedPipeFlow(mesh=mesh, backend="temporal", **self.KW)
        assert sh.steps_per_call >= 2
        single.run(8)
        sh.run(8)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(sh.state)), np.asarray(single.state),
            rtol=1e-6, atol=1e-7)

    def test_one_device_mesh_deep_k(self, has8):
        """1x1 mesh: ppermute is the identity; picks the deepest K."""
        mesh = make_mesh(1, shape=(1, 1))
        single = PipeFlow(backend="xla", **self.KW)
        sh = ShardedPipeFlow(mesh=mesh, backend="temporal", **self.KW)
        assert sh.steps_per_call == 8
        single.run(8)
        sh.run(8)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(sh.state)), np.asarray(single.state),
            rtol=1e-6, atol=1e-7)

    def test_one_device_mesh_halo_only_grid(self, has8):
        """1x1 mesh on a grid only the HALO kernel tiles (64x128: the
        unsharded temporal kernel supports no K) must fall back to the
        shard_map halo step instead of raising (advisor r4, high)."""
        mesh = make_mesh(1, shape=(1, 1))
        kw = dict(N=63, pipe_length=1.5 * 127 / 63, **PARAMS)
        single = PipeFlow(backend="xla", **kw)
        assert (single.ny, single.nx) == (64, 128)
        for backend in ("temporal", "auto"):
            sh = ShardedPipeFlow(mesh=mesh, backend=backend, **kw)
            assert sh.backend == "temporal"
            sh.run(7)
        single.run(7)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(sh.state)), np.asarray(single.state),
            rtol=1e-6, atol=1e-7)

    def test_one_device_mesh_clamps_explicit_k(self, has8):
        """1x1-mesh bypass clamps an oversized explicit k_steps to the
        deepest ring the UNSHARDED kernel supports (advisor r4, medium):
        128x128 supports K in (4, 2) only, so k_steps=8 -> 4."""
        mesh = make_mesh(1, shape=(1, 1))
        kw = dict(N=127, pipe_length=1.5, **PARAMS)
        single = PipeFlow(backend="xla", **kw)
        assert (single.ny, single.nx) == (128, 128)
        sh = ShardedPipeFlow(mesh=mesh, backend="temporal", k_steps=8, **kw)
        assert sh.steps_per_call == 4
        single.run(9)
        sh.run(9)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(sh.state)), np.asarray(single.state),
            rtol=1e-6, atol=1e-7)

    def test_remainder_steps(self, has8):
        """Iteration counts not divisible by K run the XLA remainder."""
        mesh = make_mesh(8, shape=(8, 1))
        single = PipeFlow(backend="xla", **self.KW)
        sh = ShardedPipeFlow(mesh=mesh, backend="temporal", **self.KW)
        single.run(11)
        sh.run(11)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(sh.state)), np.asarray(single.state),
            rtol=1e-6, atol=1e-7)

    def test_auto_backend_falls_back(self, has8):
        """Tiny shards (H=16) cannot host the VMEM rings; auto -> xla."""
        mesh = make_mesh(8, shape=(8, 1))
        kw = dict(N=127, pipe_length=1.5 * 126.5 / 127, **PARAMS)
        sh = ShardedPipeFlow(mesh=mesh, backend="auto", **kw)
        assert sh.backend == "xla"

    def test_get_fields_sharded(self, has8):
        """get_fields computes moments on the sharded state (no device-0
        staging) and matches the single-device fields."""
        mesh = make_mesh(8, shape=(8, 1))
        single = PipeFlow(backend="xla", **self.KW)
        sh = ShardedPipeFlow(mesh=mesh, backend="temporal", **self.KW)
        single.run(8)
        sh.run(8)
        a = single.get_fields()
        b = sh.get_fields()
        # u, v are O(1e-5) differences of O(0.4) populations, so fp32
        # reassociation noise (~1e-7 absolute) dominates their rtol.
        for k in ("rho", "u", "v"):
            np.testing.assert_allclose(b[k], a[k], rtol=1e-6, atol=1e-6)

    def test_make_mesh_raises_on_too_few_devices(self, has8):
        with pytest.raises(ValueError, match="only"):
            make_mesh(1024)


# ---- ShardedDiffusion (VERDICT r1 #6: shard the diffusion family) ---------

def test_sharded_diffusion_parity():
    """Deterministic Fisher wave: K-step halo kernel inside shard_map on a
    virtual 4x1 mesh matches the unsharded XLA step (no seam patch needed —
    the ppermute ring IS the periodic wrap)."""
    import jax
    import jax.numpy as jnp
    from lb2d_tpu.models.diffusion import ReactionAdvectionDiffusion
    from lb2d_tpu.parallel.sharded import ShardedDiffusion, make_mesh

    kw = dict(N=126, z=0.1, D=0.005, vx=1.0, vy=0.5, vc=1.0,
              Lx=0.101, Ly=0.101, g=1.0)
    ref = ReactionAdvectionDiffusion(**kw)
    step = ref._make_xla_step()
    run = jax.jit(lambda f, n: jax.lax.fori_loop(
        0, n, lambda i, s: step(s), f))
    fref = run(ref.state, 7)

    sh = ShardedDiffusion(ReactionAdvectionDiffusion(**kw),
                          mesh=make_mesh(4, shape=(4, 1)))
    assert sh.steps_per_call > 1
    sh.run(7)  # 3 sweeps + 1 remainder step
    np.testing.assert_allclose(np.asarray(sh.state), np.asarray(fref),
                               atol=1e-6, rtol=1e-5)


def test_sharded_diffusion_noisy_runs():
    """Stochastic Fisher on the sharded on-core-PRNG path: positive,
    finite, and actually grows toward carrying capacity."""
    from lb2d_tpu.models.diffusion import (
        ReactionAdvectionDiffusionStochastic)
    from lb2d_tpu.parallel.sharded import ShardedDiffusion, make_mesh

    st = ReactionAdvectionDiffusionStochastic(
        Dg=0.2, N=126, z=0.1, D=0.005, vx=1.0, vy=0.5, vc=1.0,
        Lx=0.101, Ly=0.101, g=1.0)
    sh = ShardedDiffusion(st, mesh=make_mesh(4, shape=(4, 1)))
    rho0 = float(np.asarray(sh.get_fields()["rho"]).mean())
    sh.run(6)
    rho = np.asarray(sh.get_fields()["rho"])
    assert np.isfinite(rho).all()
    assert rho.min() >= 0.0
    assert rho.mean() > rho0  # Fisher growth


def test_sharded_multifield_fisher_parity():
    """Multifield Fisher (no-flux walls) on the sharded halo kernel + wall
    band patch matches the unsharded XLA step, incl. the remainder path."""
    import jax
    from lb2d_tpu.models.multifield import FisherExpansion
    from lb2d_tpu.parallel.sharded import ShardedMultifield, make_mesh

    kwf = dict(Lx=2.05, Ly=2.05, mu_standard=1.0, mu_list=[1.0, 0.8],
               D_standard=1.0, D_list=[1.0, 1.0], N=126,
               initial_frac_widths=[0.5, 0.5], initial_frac_indices=[0, 1])
    ref = FisherExpansion(**kwf)
    step = ref._make_xla_step()
    fref = ref.state
    for _ in range(7):
        fref = step(fref)
    sh = ShardedMultifield(FisherExpansion(**kwf),
                           mesh=make_mesh(4, shape=(4, 1)))
    assert sh.steps_per_call > 1
    sh.run(7)
    np.testing.assert_allclose(np.asarray(sh._state4()), np.asarray(fref),
                               atol=1e-6, rtol=1e-5)


def test_sharded_multifield_expansion_runs():
    """Stochastic range expansion (populations + nutrient) sharded: finite,
    non-negative populations, nutrient consumed."""
    from lb2d_tpu.models.multifield import Expansion
    from lb2d_tpu.parallel.sharded import ShardedMultifield, make_mesh

    ex = Expansion(Lx=2.05, Ly=2.05, mu_standard=1.0, mu_list=[1.0, 0.8],
                   D_standard=1.0, D_list=[1.0, 1.0], N=126)
    sh = ShardedMultifield(ex, mesh=make_mesh(4, shape=(4, 1)))
    f0, _ = sh._state4()
    nut0 = float(np.asarray(f0.sum(axis=0)[-1]).sum())
    sh.run(6)
    f, _ = sh._state4()
    rho = np.asarray(f.sum(axis=0))
    assert np.isfinite(rho).all() and rho.min() >= 0.0
    assert rho[-1].sum() < nut0  # nutrient consumed by growth


def test_noflux_bcs_gspmd_safe():
    """The no-flux BC under GSPMD on a y-sharded array matches eager —
    regression for the scatter miscompilation (edge .at[].set applied the
    global row -1 update to every shard's last local row)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from lb2d_tpu.models.multifield import noflux_bcs_multifield
    from lb2d_tpu.parallel.sharded import make_mesh

    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.rand(9, 2, 64, 32), jnp.float32)
    mesh = make_mesh(4, shape=(4, 1))
    fs = jax.device_put(f, NamedSharding(mesh, P(None, None, "y", None)))
    a = jax.jit(noflux_bcs_multifield)(fs)
    b = noflux_bcs_multifield(f)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_coupled_rocket_yeast_parity():
    """K-deep rocket-yeast kernel per shard (fully local physics) matches
    the unsharded XLA step."""
    import jax
    from lb2d_tpu.models.rocket_yeast import RocketYeast
    from lb2d_tpu.parallel.sharded import ShardedCoupled, make_mesh

    kw = dict(Lx=1.0, Ly=1.0, R0=0.2, epsilon=0.05, Gc=2.0, N=128,
              G_chen=-0.1)
    ref = RocketYeast(**kw)
    xs = jax.jit(ref._make_xla_step())
    fx = ref.state
    for _ in range(7):
        fx = xs(fx)
    sh = ShardedCoupled(RocketYeast(**kw), mesh=make_mesh(4, shape=(4, 1)))
    assert sh.steps_per_call > 1
    sh.run(7)  # sweeps + remainder
    np.testing.assert_allclose(np.asarray(sh._state_model()),
                               np.asarray(fx), atol=5e-7, rtol=1e-5)


def test_sharded_coupled_rocket_yeast_forces_only_parity():
    """The sharded forces-only variant must run the forces-only velocity
    (pseudo-force + surface tension), not silently fall back to the
    standard rocket-yeast physics (regression: the kernel factory was
    called without the forces_only kwargs)."""
    import jax
    from lb2d_tpu.models.rocket_yeast import RocketYeastForcesOnly
    from lb2d_tpu.parallel.sharded import ShardedCoupled, make_mesh

    kw = dict(Lx=1.0, Ly=1.0, R0=0.2, epsilon=0.05, Gc=2.0, N=128,
              G_chen=-0.1, c_o=0.3, alpha=2.0)
    ref = RocketYeastForcesOnly(**kw)
    xs = jax.jit(ref._make_xla_step())
    fx = ref.state
    for _ in range(7):
        fx = xs(fx)
    sh = ShardedCoupled(RocketYeastForcesOnly(**kw),
                        mesh=make_mesh(4, shape=(4, 1)))
    sh.run(7)
    np.testing.assert_allclose(np.asarray(sh._state_model()),
                               np.asarray(fx), atol=5e-7, rtol=1e-5)


def test_sharded_coupled_spectral_parity():
    """Spectral-velocity families sharded: the screened-Poisson solve runs
    globally under GSPMD, the kernel per shard."""
    import jax
    from lb2d_tpu.models.waves import ScreenedFisherWave
    from lb2d_tpu.parallel.sharded import ShardedCoupled, make_mesh

    kw = dict(Lx=1.0, Ly=1.0, vc=1.0, lam=0.5, R0=0.2, N=128)
    ref = ScreenedFisherWave(**kw)
    xs = jax.jit(ref._make_xla_step())
    fx = ref.state
    for _ in range(5):
        fx = xs(fx)
    sh = ShardedCoupled(ScreenedFisherWave(**kw),
                        mesh=make_mesh(4, shape=(4, 1)))
    sh.run(5)
    np.testing.assert_allclose(np.asarray(sh._state_model()),
                               np.asarray(fx), atol=5e-7, rtol=1e-5)


def test_sharded_coupled_spectral_stale_parity():
    """Sweep-stale spectral family on a sharded mesh (one global solve per
    K-step sweep, ext halo chunks ppermuted from the y-neighbors) matches
    the UNSHARDED stale kernel path bit-close — the halo ext rows must be
    the true neighbor values, not the shard-local wrap."""
    import jax
    from lb2d_tpu.models.waves import ScreenedFisherWave
    from lb2d_tpu.parallel.sharded import ShardedCoupled, make_mesh

    kw = dict(Lx=1.0, Ly=1.0, vc=1.0, lam=0.5, R0=0.2, N=128,
              stale_velocity=2)
    ref = ScreenedFisherWave(**kw)
    ref.run(6)   # 3 sweeps through the unsharded stale kernel
    sh = ShardedCoupled(ScreenedFisherWave(**kw),
                        mesh=make_mesh(4, shape=(4, 1)))
    assert sh.steps_per_call == 2
    sh.run(6)
    np.testing.assert_allclose(np.asarray(sh._state_model()),
                               np.asarray(ref.state), atol=5e-7, rtol=1e-5)


def test_sharded_coupled_2d_mesh_parity():
    """ShardedCoupled on a 2-D mesh: x-neighbor 128-lane strips keep the
    coupled kernels on the kernel path with x-sharding. Rocket-yeast
    (K-deep, no ext) and the spectral wave (per-step GSPMD solve + ext
    planes) vs the unsharded oracles on a virtual 2x2 mesh."""
    import jax
    from lb2d_tpu.models.rocket_yeast import RocketYeast
    from lb2d_tpu.models.waves import ScreenedFisherWave
    from lb2d_tpu.parallel.sharded import ShardedCoupled, make_mesh

    kw = dict(Lx=1.0, Ly=1.0, R0=0.2, epsilon=0.05, Gc=2.0, N=256,
              G_chen=-0.1)
    ref = RocketYeast(**kw)
    xs = jax.jit(ref._make_xla_step())
    fx = ref.state
    for _ in range(7):
        fx = xs(fx)
    sh = ShardedCoupled(RocketYeast(**kw), mesh=make_mesh(4, shape=(2, 2)))
    assert sh.steps_per_call > 1
    sh.run(7)
    np.testing.assert_allclose(np.asarray(sh._state_model()),
                               np.asarray(fx), atol=5e-7, rtol=1e-5)

    kw2 = dict(Lx=1.0, Ly=1.0, vc=1.0, lam=0.5, R0=0.2, N=256)
    ref2 = ScreenedFisherWave(**kw2)
    xs2 = jax.jit(ref2._make_xla_step())
    fx2 = ref2.state
    for _ in range(4):
        fx2 = xs2(fx2)
    sh2 = ShardedCoupled(ScreenedFisherWave(**kw2),
                         mesh=make_mesh(4, shape=(2, 2)))
    sh2.run(4)
    np.testing.assert_allclose(np.asarray(sh2._state_model()),
                               np.asarray(fx2), atol=5e-7, rtol=1e-5)


def test_sharded_coupled_2d_stale_parity():
    """The remaining combination: sweep-stale spectral family on a 2-D
    mesh — ppermuted ext halo chunks AND x-neighbor lane strips in one
    step. Parity vs the unsharded stale kernel on a virtual 2x2 mesh."""
    from lb2d_tpu.models.waves import ScreenedFisherWave
    from lb2d_tpu.parallel.sharded import ShardedCoupled, make_mesh

    kw = dict(Lx=1.0, Ly=1.0, vc=1.0, lam=0.5, R0=0.2, N=256,
              stale_velocity=2)
    ref = ScreenedFisherWave(**kw)
    ref.run(6)
    sh = ShardedCoupled(ScreenedFisherWave(**kw),
                        mesh=make_mesh(4, shape=(2, 2)))
    assert sh.steps_per_call == 2
    sh.run(6)
    np.testing.assert_allclose(np.asarray(sh._state_model()),
                               np.asarray(ref.state), atol=5e-7, rtol=1e-5)


def test_sharded_velocity_clears_pallas_gate():
    """Under a >1-device mesh the screened-velocity solve must take the
    GSPMD-partitionable matmul path, never the opaque Pallas custom call
    (waves.py allow_pallas gate)."""
    from lb2d_tpu.models.multicomponent import Fluid, SimulationRunner
    from lb2d_tpu.models.waves import ScreenedFisherWave
    from lb2d_tpu.parallel.sharded import ShardedCoupled, make_mesh

    base = ScreenedFisherWave(Lx=1.0, Ly=1.0, vc=1.0, lam=0.5, R0=0.2,
                              N=128)
    assert base._velocity.allow_pallas
    ShardedCoupled(base, mesh=make_mesh(4, shape=(4, 1)))
    assert not base._velocity.allow_pallas

    sim = SimulationRunner(nx=128, ny=128, L_lb=128, T_lb=1.0,
                           num_populations=2)
    for i in range(2):
        sim.add_fluid(Fluid(sim, i, nu_e=1.0 / 6.0))
    sim.complete_setup()
    sim.fluid_list[0].initialize(np.full((128, 128), 0.5, np.float32))
    sim.fluid_list[1].initialize(np.full((128, 128), 0.5, np.float32))
    sim.add_screened_poisson_force(0, 1, interaction_length=4.0,
                                   amplitude=1e-4)
    vel = next(d[3] for d in sim._force_desc if d[0] == "dyn_ext")
    assert vel.allow_pallas
    sim.shard_over(make_mesh(4, shape=(4, 1)))
    assert not vel.allow_pallas


class TestTemporalSharded2D:
    """x-extended temporal kernel on 2-D meshes (lane-direction halo
    strips ppermuted from x-neighbors; VERDICT r2 item 4)."""

    KW = dict(N=255, pipe_length=1.5 * 510.5 / 255, **PARAMS)  # 256 x 512

    def test_2x4_mesh_kernel_parity(self, has8):
        mesh = make_mesh(8, shape=(2, 4))
        single = PipeFlow(backend="xla", **self.KW)
        assert (single.ny, single.nx) == (256, 512)
        sh = ShardedPipeFlow(mesh=mesh, backend="temporal", **self.KW)
        assert sh.steps_per_call >= 2  # kernel path engaged on mx=4
        single.run(8)
        sh.run(8)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(sh.state)), np.asarray(single.state),
            rtol=1e-6, atol=1e-7)

    def test_4x2_mesh_auto_and_remainder(self, has8):
        mesh = make_mesh(8, shape=(4, 2))
        single = PipeFlow(backend="xla", **self.KW)
        sh = ShardedPipeFlow(mesh=mesh, backend="auto", **self.KW)
        assert sh.backend == "temporal"  # auto engages the 2-D kernel path
        single.run(sh.steps_per_call + 3)  # sweep + XLA remainder
        sh.run(sh.steps_per_call + 3)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(sh.state)), np.asarray(single.state),
            rtol=1e-6, atol=1e-7)

    def test_unaligned_width_falls_back(self, has8):
        # W = 128/4 = 32 lanes per shard: not 128-aligned -> XLA path
        mesh = make_mesh(8, shape=(2, 4))
        kw = dict(N=255, pipe_length=1.5 * 126.5 / 255, **PARAMS)  # 256x128
        sh = ShardedPipeFlow(mesh=mesh, backend="auto", **kw)
        assert sh.backend == "xla"


def test_sharded_diffusion_2d_mesh_parity():
    """Diffusion family on a 2x4 mesh: x-extended kernel, periodic wrap IS
    the ppermute ring in both directions."""
    import jax
    from lb2d_tpu.models.diffusion import ReactionAdvectionDiffusion
    from lb2d_tpu.parallel.sharded import ShardedDiffusion, make_mesh

    # 512x512 grid -> shards 256 rows x 128 lanes on a 2x4 mesh
    kw = dict(N=510, z=0.1, D=0.005, vx=1.0, vy=0.5, vc=1.0,
              Lx=0.101, Ly=0.101, g=1.0)
    ref = ReactionAdvectionDiffusion(**kw)
    assert (ref.ny, ref.nx) == (512, 512)
    step = ref._make_xla_step()
    run = jax.jit(lambda f, n: jax.lax.fori_loop(
        0, n, lambda i, s: step(s), f))
    fref = run(ref.state, 5)

    sh = ShardedDiffusion(ReactionAdvectionDiffusion(**kw),
                          mesh=make_mesh(8, shape=(2, 4)))
    assert sh.steps_per_call > 1
    sh.run(5)
    np.testing.assert_allclose(np.asarray(sh.state), np.asarray(fref),
                               atol=1e-6, rtol=1e-5)


def test_distributed_single_process_init(has8):
    """Multi-host entry point: the single-process path initializes without
    a coordinator and yields a global mesh the sharded models accept."""
    from lb2d_tpu.parallel.distributed import (global_mesh, init_distributed,
                                               is_initialized)

    init_distributed(num_processes=1)
    assert is_initialized()
    mesh = global_mesh()
    assert mesh.shape["y"] * mesh.shape["x"] == len(jax.devices())
    assert mesh.shape["y"] >= mesh.shape["x"]  # y-major (kernel fast path)
    # the mesh drives the ordinary sharded surface
    kw = dict(N=15, pipe_length=1.5 * 30.5 / 15, **PARAMS)
    mesh2 = global_mesh(shape=(8, 1))
    sh = ShardedPipeFlow(mesh=mesh2, **kw)
    sh.run(4)
    assert np.isfinite(np.asarray(jax.device_get(sh.state))).all()


def test_distributed_two_process_parity(has8):
    """The >1-process branch of ``init_distributed`` actually executes
    (VERDICT r3 #2): two CPU processes (4 virtual devices each) join
    through a localhost coordinator, build the 8-device global mesh, run
    ShardedPipeFlow, and match the single-process 8-device run."""
    import json
    import os
    import socket
    import subprocess
    import sys as _sys

    import jax.numpy as jnp

    child = os.path.join(os.path.dirname(__file__), "_dist_child_pipe.py")
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [_sys.executable, child, str(i), str(port), "5"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, (out[-1000:], err[-2000:])
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        outs.append(json.loads(line[len("RESULT "):]))
    assert [o["nproc"] for o in outs] == [2, 2]
    assert [o["ndev"] for o in outs] == [8, 8]
    # both processes computed the identical replicated diagnostics
    np.testing.assert_array_equal(outs[0]["prof"], outs[1]["prof"])
    assert outs[0]["mass"] == outs[1]["mass"]
    # parity vs the single-process run on this test process's own 8 devices
    from lb2d_tpu.parallel.distributed import global_mesh
    sim = ShardedPipeFlow(mesh=global_mesh(shape=(8, 1)), N=15,
                          pipe_length=1.5 * 30.5 / 15, **PARAMS)
    sim.run(5)
    mass = float(jnp.sum(sim.state))
    prof = np.asarray(jnp.sum(sim.state, axis=(0, 2)))
    np.testing.assert_allclose(outs[0]["mass"], mass, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[0]["prof"]), prof, rtol=1e-5)


def test_distributed_two_process_kernel_parity(has8):
    """The per-shard PALLAS KERNEL families across a real process boundary
    (VERDICT r4 #3): two CPU processes run ShardedDiffusion over the
    8-device global mesh — ppermute halo chunks feed the K-step temporal
    halo kernel across processes — and match the single-process run."""
    import json
    import os
    import socket
    import subprocess
    import sys as _sys

    import jax.numpy as jnp

    child = os.path.join(os.path.dirname(__file__), "_dist_child_diffusion.py")
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen(
        [_sys.executable, child, str(i), str(port), "6"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, (out[-1000:], err[-2000:])
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        outs.append(json.loads(line[len("RESULT "):]))
    assert [o["nproc"] for o in outs] == [2, 2]
    assert all(o["K"] > 1 for o in outs)      # kernel path, not XLA
    np.testing.assert_array_equal(outs[0]["prof"], outs[1]["prof"])
    assert outs[0]["mass"] == outs[1]["mass"]
    # parity vs the single-process run on this test process's 8 devices
    # (same mesh shape, same K, same ppermute ring -> same numerics)
    from lb2d_tpu.models.diffusion import ReactionAdvectionDiffusion
    from lb2d_tpu.parallel.distributed import global_mesh
    from lb2d_tpu.parallel.sharded import ShardedDiffusion
    base = ReactionAdvectionDiffusion(N=254, z=0.1, D=0.005, vx=1.0, vy=0.5,
                                      vc=1.0, Lx=0.101, Ly=0.101, g=1.0)
    sim = ShardedDiffusion(base, mesh=global_mesh(shape=(8, 1)))
    sim.run(6)
    mass = float(jnp.sum(sim.state))
    prof = np.asarray(jnp.sum(sim.state, axis=(0, 2)))
    np.testing.assert_allclose(outs[0]["mass"], mass, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[0]["prof"]), prof, rtol=1e-5)


def test_sharded_multifield_fisher_2d_mesh_parity():
    """FisherExpansion on a 2-D mesh: x-neighbor lane strips + the x-wall
    lane-band splice mirror the y machinery; parity vs the unsharded XLA
    step on a virtual 2x2 mesh (VERDICT r3 #6)."""
    import jax
    from lb2d_tpu.models.multifield import FisherExpansion
    from lb2d_tpu.parallel.sharded import ShardedMultifield, make_mesh

    kwf = dict(Lx=2.05, Ly=2.05, mu_standard=1.0, mu_list=[1.0, 0.8],
               D_standard=1.0, D_list=[1.0, 1.0], N=254,
               initial_frac_widths=[0.5, 0.5], initial_frac_indices=[0, 1])
    ref = FisherExpansion(**kwf)
    assert (ref.ny, ref.nx) == (256, 256)
    step = ref._make_xla_step()
    fref = ref.state
    for _ in range(5):
        fref = step(fref)
    sh = ShardedMultifield(FisherExpansion(**kwf),
                           mesh=make_mesh(4, shape=(2, 2)))
    assert sh.steps_per_call > 1
    sh.run(5)
    np.testing.assert_allclose(np.asarray(sh._state4()), np.asarray(fref),
                               atol=1e-6, rtol=1e-5)


def test_sharded_multifield_expansion_2d_runs():
    """Stochastic Expansion on a 2-D mesh: finite, non-negative, nutrient
    consumed (noise realization differs per shard by design)."""
    from lb2d_tpu.models.multifield import Expansion
    from lb2d_tpu.parallel.sharded import ShardedMultifield, make_mesh

    ex = Expansion(Lx=2.05, Ly=2.05, mu_standard=1.0, mu_list=[1.0, 0.8],
                   D_standard=1.0, D_list=[1.0, 1.0], N=254)
    sh = ShardedMultifield(ex, mesh=make_mesh(4, shape=(2, 2)))
    f0, _ = sh._state4()
    nut0 = float(np.asarray(f0.sum(axis=0)[-1]).sum())
    sh.run(sh.steps_per_call * 2 + 1)
    f, _ = sh._state4()
    rho = np.asarray(f.sum(axis=0))
    assert np.isfinite(rho).all() and rho.min() >= 0.0
    assert rho[-1].sum() < nut0  # nutrient consumed by growth
