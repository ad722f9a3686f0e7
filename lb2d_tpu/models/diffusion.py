"""Advection-diffusion / reaction-diffusion model family.

Rebuilds ``reaction_diffusion/diffusion.py`` (classes ``Diffusion``,
``Advection_Diffusion``, ``Reaction_Diffusion``,
``Reaction_Advection_Diffusion``, ``Reaction_Advection_Diffusion_Stochastic``)
on the TPU-native core: scalar density advected by an *imposed* velocity
field with linear feq (``D2Q9_diffusion.cl:1-38``), hydro = density only
(``:41-68``), optional Fisher growth ``G rho (1-rho)`` distributed by lattice
weights (``:95-124``) and optional multiplicative noise
``sqrt(Dg rho (1-rho)) * eta`` with negativity clipping (``:126-167``).

Documented divergences from the reference (SURVEY.md §8 "replicate, not
cargo-cult"):

* The reference's ``move_bcs`` for this family is a no-op
  (``diffusion.py:326-331``), which combined with its bounds-checked scatter
  leaves boundary-incoming populations frozen at their initial values — an
  accidental stale-inflow boundary. We use clean periodic wrap instead;
  the two agree wherever the density hasn't reached the domain edge (the
  regime every reference notebook runs in).
* ``diffusion.py:516-519`` passes arguments to ``collide_particles_fisher``
  in an order that does not match the kernel signature
  (``D2Q9_diffusion.cl:96-101``), and ``collide_particles_fisher_stochastic``
  (``diffusion.py:582``) does not exist in the kernel file — both latent
  bugs. We implement the *intended* semantics (the formulas in the kernels).
* The stochastic class passes the physical ``Dg`` straight to the kernel
  (``diffusion.py:568,587``) without unit conversion; we preserve that
  behavior (``Dg`` is interpreted as the lattice-units noise amplitude) and
  note it here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.lattice import D2Q9
from ..ops.collide import bgk
from ..ops.equilibrium import feq_linear
from ..ops.moments import density
from ..ops.stream import stream
from .base import LBModel

__all__ = [
    "Diffusion",
    "AdvectionDiffusion",
    "ReactionDiffusion",
    "ReactionAdvectionDiffusion",
    "ReactionAdvectionDiffusionStochastic",
]


def make_noisy_temporal_step(ny, nx, omega, u_lb, v_lb, lb_G, lb_Dg, K,
                             xla_step, dtype, interpret=None):
    """K-step temporal-blocked kernel for the stochastic Fisher family
    (state ``(f, key)``), with the periodic seam patch.

    The kernel draws its normals from the on-core TPU PRNG
    (``pltpu.prng_random_bits`` + Box-Muller), seeded per
    (sweep, chunk, stage) from a key-derived int32; the seam band is
    recomputed with K plain XLA steps whose noise comes from ``jax.random``
    — a different (but identically-distributed) realization. See
    DIVERGENCES.md: within ~2K rows of the y-wrap the stitched noise
    realization is not a single consistent SPDE sample; marginal statistics
    are unaffected.
    """
    from ..ops.fused import make_temporal_pipe_step

    kw = {} if interpret is None else {"interpret": interpret}
    kernel = make_temporal_pipe_step(
        ny=ny, nx=nx, omega=float(omega), physics="noisy_fisher",
        u_lb=float(u_lb), v_lb=float(v_lb), lb_G=float(lb_G),
        lb_Dg=float(lb_Dg), k_steps=K, dtype=dtype, **kw)
    B = 3 * K
    band_idx = jnp.asarray(np.arange(-B, B) % ny)
    patch_rows = jnp.asarray(np.arange(-K, K) % ny)

    def stepK(state):
        f, key = state
        key, ks, kb = jax.random.split(key, 3)
        seed = jax.lax.bitcast_convert_type(
            jax.random.bits(ks, (1, 1), jnp.uint32), jnp.int32)
        out = kernel(f, seed)
        bstate = (f[:, band_idx, :], kb)
        for _ in range(K):
            bstate = xla_step(bstate)
        out = out.at[:, patch_rows, :].set(bstate[0][:, B - K:B + K, :])
        return (out, key)

    return stepK


class Diffusion(LBModel):
    """Pure diffusion of an initially-Gaussian density blob
    (``diffusion.py:56-185``): characteristic scales L = z, T = z^2/D so the
    dimensionless diffusivity is 1; ``D_lb = dt/dx^2``,
    ``omega = (0.5 + D_lb/cs^2)^-1``."""

    def __init__(self, Lx=1.0, Ly=1.0, D=1.0, z=0.1, time_prefactor=1.0,
                 N=50, seed=0, dtype=jnp.float32):
        self.phys_Lx, self.phys_Ly = Lx, Ly
        self.phys_D, self.phys_z = D, z
        self.N = N
        self.time_prefactor = time_prefactor
        self.lattice = D2Q9
        self.dtype = dtype

        self.set_characteristic_length_time()
        self.delta_x = 1.0 / N
        self.delta_t = time_prefactor * self.delta_x**2
        self.ulb = self.delta_t / self.delta_x
        self.set_D_and_omega()

        # grid (diffusion.py:188-198): note +2 boundary ring, and int()
        # truncation (not ceil) of the physical extent
        self.lx = self.N * int(self.phys_Lx / self.L)
        self.ly = self.N * int(self.phys_Ly / self.L)
        self.nx, self.ny = self.lx + 2, self.ly + 2

        rng = np.random.RandomState(seed)
        self._init_velocity()
        self.state = self._init_state(rng)
        super().__init__()
        if getattr(self, "backend", None) == "resident":
            self._install_resident_run()

    # -- scaling hooks ---------------------------------------------------------
    def set_characteristic_length_time(self):
        self.L = self.phys_z
        self.T = self.phys_z**2 / self.phys_D

    def set_D_and_omega(self):
        # diffusion.py:168-174
        self.lb_D = self.delta_t / self.delta_x**2
        self.omega = 1.0 / (0.5 + self.lb_D / self.lattice.cs2)
        assert self.omega < 2.0

    # -- velocity field (imposed) ---------------------------------------------
    def _init_velocity(self):
        self.u = jnp.zeros((1, 1), self.dtype)  # broadcastable constants
        self.v = jnp.zeros((1, 1), self.dtype)

    # -- state -----------------------------------------------------------------
    def _initial_rho(self) -> np.ndarray:
        """Gaussian blob in dimensionless coordinates (diffusion.py:258-280),
        centered at (nx//2, ny//2)."""
        X, Y = np.meshgrid(np.arange(self.nx), np.arange(self.ny))
        Xd = (X - self.nx // 2) / self.N
        Yd = (Y - self.ny // 2) / self.N
        return np.exp(-(Xd**2 + Yd**2)).astype(np.float32)  # [ny, nx]

    def _init_state(self, rng):
        rho0 = jnp.asarray(self._initial_rho(), self.dtype)
        feq0 = feq_linear(rho0, self.u, self.v)
        perturb = 1.0 + 0.001 * rng.randn(9, self.ny, self.nx)
        return feq0 * jnp.asarray(perturb, self.dtype)

    @property
    def num_cells(self):
        return self.nx * self.ny

    # -- step ------------------------------------------------------------------
    def _source(self, rho):
        return None  # no reaction

    def _lb_G(self):
        return 0.0  # no reaction

    def make_step(self):
        # deterministic members of the family (constant imposed velocity,
        # constant growth rate) can run the fused temporal kernel on TPU
        from ..ops.fused import make_temporal_pipe_step, supports_temporal

        if self._resident_capable():
            # the runner is swapped for the grid-resident kernel after
            # LBModel.__init__ (_install_resident_run); make_step only
            # provides the oracle single-step. The reference's actual
            # scientific workloads run this family at 96^2-512^2
            # (reaction_diffusion/diffusion.py:56), squarely in the
            # residency window.
            self.backend = "resident"
            return self._make_xla_step()
        # deepest K that fits (2048^2: K=4 9.1k / K=6 12.4k / K=8 14.2k
        # MLUPS); the 6K-row seam-patch recompute stays negligible
        for K in (8, 6, 4):
            if (jax.default_backend() == "tpu"
                    and supports_temporal(self.ny, self.nx, K)
                    and self.ny >= 24 * K):
                self.backend = "temporal"
                return self._make_temporal_step(K, make_temporal_pipe_step)
        self.backend = "xla"
        return self._make_xla_step()

    def _resident_capable(self):
        from ..ops.fused import supports_resident

        # Alignment must be exact (nx % 128, ny % 8): the flow family's
        # edge-padding trick is a wall trick — unsound for periodic
        # physics, where padded lanes would wrap into the domain.
        return (jax.default_backend() == "tpu"
                and supports_resident(self.ny, self.nx, False,
                                      self.lattice.q))

    def _install_resident_run(self, interpret=None):
        """Whole-run-in-ONE-launch resident kernel (cf.
        ``PipeFlow._install_resident_run``). The diffusion family is fully
        periodic and the resident kernel's full-grid slice-concat wrap IS
        the exact periodic stream — unlike the K-sweep temporal path, no
        seam patch is needed and the kernel is *exact* vs the XLA oracle."""
        from ..ops.fused import make_resident_pipe_step

        kw = {} if interpret is None else {"interpret": interpret}
        run_k = make_resident_pipe_step(
            ny=self.ny, nx=self.nx, omega=float(self.omega),
            physics="diffusion", u_lb=float(np.asarray(self.u).ravel()[0]),
            v_lb=float(np.asarray(self.v).ravel()[0]),
            lb_G=float(self._lb_G()), dtype=self.dtype, **kw)
        self._run_compiled = jax.jit(run_k, donate_argnums=0)
        self.backend = "resident"
        self.steps_per_call = 1

    def _make_temporal_step(self, K, make_temporal_pipe_step,
                            interpret=None):
        """Temporal-blocked kernel + seam patch.

        The diffusion domain is fully periodic, so the K-step sweep's wrap
        seam (rows within K-1 of y = 0) sees garbage/stale halos the flow
        kernel's walls would have rewritten. Fix: recompute a 6K-row band
        around the seam with K plain XLA steps on a wrapped slice (its
        central rows are exact — the influence cone grows one row per step)
        and splice the affected 2(K-1) rows back in. Band cost: 6K rows of
        ny — negligible.
        """
        import jax as _jax

        kw = {} if interpret is None else {"interpret": interpret}
        kernel = make_temporal_pipe_step(
            ny=self.ny, nx=self.nx, omega=float(self.omega),
            physics="diffusion", u_lb=float(np.asarray(self.u).ravel()[0]),
            v_lb=float(np.asarray(self.v).ravel()[0]),
            lb_G=float(self._lb_G()), k_steps=K, dtype=self.dtype, **kw)
        xla_step = self._make_xla_step()
        B = 3 * K
        band_idx = jnp.asarray(np.arange(-B, B) % self.ny)
        # garbage/stale halos contaminate one row per internal stage on each
        # side of the seam: rows [-K, K) need the patch
        patch_rows = jnp.asarray(np.arange(-K, K) % self.ny)

        def stepK(f):
            out = kernel(f)
            band = f[:, band_idx, :]
            for _ in range(K):
                band = xla_step(band)
            out = out.at[:, patch_rows, :].set(
                band[:, B - K:B + K, :])
            return out

        self.steps_per_call = K
        self._single_step = xla_step
        return stepK

    def _make_xla_step(self):
        u, v = self.u, self.v
        omega = jnp.asarray(self.omega, self.dtype)
        w = jnp.asarray(self.lattice.w_np(np.float32), self.dtype)[:, None, None]
        source = self._source

        def step(f):
            f = stream(f, self.lattice)
            rho = density(f)
            feq = feq_linear(rho, u, v, self.lattice)
            f = bgk(f, feq, omega)
            s = source(rho)
            if s is not None:
                f = f + w * s
            return f

        return step

    def device_field(self, name):
        if name == "rho":
            return density(self.state)
        return None

    # -- getters (diffusion.py:385-432) ---------------------------------------
    def get_fields(self):
        f = self.state
        rho = density(f)
        feq = feq_linear(rho, self.u, self.v)
        ones = jnp.broadcast_to
        return {
            "f": self._to_host_xy(f),
            "feq": self._to_host_xy(jnp.broadcast_to(feq, f.shape)),
            "rho": self._to_host_xy(rho),
            "u": self._to_host_xy(ones(self.u, rho.shape)),
            "v": self._to_host_xy(ones(self.v, rho.shape)),
        }

    def get_nondim_fields(self):
        fields = self.get_fields()
        scale = self.delta_x / self.delta_t
        fields["u"] = fields["u"] * scale
        fields["v"] = fields["v"] * scale
        return fields

    def get_physical_fields(self):
        fields = self.get_nondim_fields()
        fields["u"] = fields["u"] * (self.L / self.T)
        fields["v"] = fields["v"] * (self.L / self.T)
        return fields


class AdvectionDiffusion(Diffusion):
    """Diffusion in a uniform imposed flow (``diffusion.py:433-481``):
    L = z, T = z/vc, Peclet Pe = z vc / D, ``D_lb = (dt/dx^2)/Pe``,
    imposed lattice velocity ``(dt/dx) * v_phys/vc``."""

    def __init__(self, vx=1.0, vy=1.0, vc=1.0, **kwargs):
        self.phys_vx, self.phys_vy, self.phys_vc = vx, vy, vc
        self.Pe = None
        super().__init__(**kwargs)

    def set_characteristic_length_time(self):
        self.L = self.phys_z
        self.T = self.phys_z / self.phys_vc

    def set_D_and_omega(self):
        self.Pe = self.phys_z * self.phys_vc / self.phys_D
        self.lb_D = (self.delta_t / self.delta_x**2) / self.Pe
        self.omega = 1.0 / (0.5 + self.lb_D / self.lattice.cs2)
        assert self.omega < 2.0

    def _init_velocity(self):
        lb_vx = self.ulb * self.phys_vx / self.phys_vc
        lb_vy = self.ulb * self.phys_vy / self.phys_vc
        self.u = jnp.asarray(np.float32(lb_vx))[None, None]
        self.v = jnp.asarray(np.float32(lb_vy))[None, None]


class ReactionDiffusion(Diffusion):
    """Fisher wave: diffusion + logistic growth ``G rho (1 - rho)``
    (``diffusion.py:482-519``; source formula ``D2Q9_diffusion.cl:112-121``).
    ``G_lb = (T g) * dt``."""

    def __init__(self, g=1.0, **kwargs):
        self.g = g
        super().__init__(**kwargs)

    def set_D_and_omega(self):
        super().set_D_and_omega()
        self.G_dim = self.T * self.g
        self.G = self.G_dim * self.delta_t

    def _source(self, rho):
        G = jnp.asarray(self.G, self.dtype)
        return G * rho * (1.0 - rho)

    def _lb_G(self):
        return self.G


class ReactionAdvectionDiffusion(AdvectionDiffusion):
    """Fisher wave advected by a uniform flow (``diffusion.py:521-553``);
    dimensionless Fisher speed ``v_f = 2 sqrt(G_dim / Pe)``
    (``diffusion.py:542``)."""

    def __init__(self, g=1.0, **kwargs):
        self.g = g
        super().__init__(**kwargs)

    def set_D_and_omega(self):
        super().set_D_and_omega()
        self.G_dim = self.T * self.g
        self.G = self.G_dim * self.delta_t
        self.vf_dim = 2.0 * np.sqrt(self.G_dim / self.Pe)

    def _source(self, rho):
        G = jnp.asarray(self.G, self.dtype)
        return G * rho * (1.0 - rho)

    def _lb_G(self):
        return self.G


class ReactionAdvectionDiffusionStochastic(ReactionAdvectionDiffusion):
    """Stochastic Fisher wave: adds ``sqrt(Dg rho (1-rho)) eta`` per cell with
    fresh normals every step and clips negative populations to zero
    (``D2Q9_diffusion.cl:126-167``; per-step Philox refresh
    ``diffusion.py:596-607`` -> per-step ``jax.random`` key split here).

    State is the pytree ``(f, key)``.
    """

    def __init__(self, Dg=1.0, rng_seed=0, **kwargs):
        self.Dg = Dg
        self._rng_seed = rng_seed
        super().__init__(**kwargs)

    def _init_state(self, rng):
        f = super()._init_state(rng)
        return (f, jax.random.PRNGKey(self._rng_seed))

    def make_step(self):
        from ..ops.fused import supports_temporal

        if self._resident_capable():
            self.backend = "resident"
            return self._make_xla_stochastic_step()
        # deeper blocking keeps winning for this VPU-heavy kernel
        # (measured at 2048^2: K=4 6960 / K=6 8437 / K=8 9342 MLUPS)
        K = 8 if self.ny >= 24 * 8 else 4
        if (jax.default_backend() == "tpu"
                and supports_temporal(self.ny, self.nx, K)
                and self.ny >= 24 * K):
            self.backend = "temporal"
            return self._make_noisy_temporal_step(K)
        self.backend = "xla"
        return self._make_xla_stochastic_step()

    def _install_resident_run(self, interpret=None):
        """Resident kernel for the stochastic Fisher wave: the whole
        ``run(n)`` is one launch; normals come from the on-core TPU PRNG
        reseeded per step from a launch seed (a different — identically
        distributed — realization than ``jax.random``, same divergence
        note as the temporal path)."""
        from ..ops.fused import make_resident_pipe_step

        kw = {} if interpret is None else {"interpret": interpret}
        run_k = make_resident_pipe_step(
            ny=self.ny, nx=self.nx, omega=float(self.omega),
            physics="noisy_fisher",
            u_lb=float(np.asarray(self.u).ravel()[0]),
            v_lb=float(np.asarray(self.v).ravel()[0]),
            lb_G=float(self.G), lb_Dg=float(self.Dg), dtype=self.dtype,
            **kw)

        def run(state, n):
            f, key = state
            key, ks = jax.random.split(key)
            seed = jax.lax.bitcast_convert_type(
                jax.random.bits(ks, (), jnp.uint32), jnp.int32)
            return (run_k(f, n, seed), key)

        self._run_compiled = jax.jit(run, donate_argnums=0)
        self.backend = "resident"
        self.steps_per_call = 1

    def _make_noisy_temporal_step(self, K, interpret=None):
        stepK = make_noisy_temporal_step(
            self.ny, self.nx, self.omega,
            float(np.asarray(self.u).ravel()[0]),
            float(np.asarray(self.v).ravel()[0]),
            self.G, self.Dg, K, self._make_xla_stochastic_step(),
            self.dtype, interpret=interpret)
        self.steps_per_call = K
        self._single_step = self._make_xla_stochastic_step()
        return stepK

    def _make_xla_stochastic_step(self):
        u, v = self.u, self.v
        omega = jnp.asarray(self.omega, self.dtype)
        w = jnp.asarray(self.lattice.w_np(np.float32), self.dtype)[:, None, None]
        G = jnp.asarray(self.G, self.dtype)
        Dg = jnp.asarray(self.Dg, self.dtype)

        def step(state):
            f, key = state
            key, sub = jax.random.split(key)
            f = stream(f, self.lattice)
            rho = density(f)
            feq = feq_linear(rho, u, v, self.lattice)
            eta = jax.random.normal(sub, rho.shape, self.dtype)
            grow = G * rho * (1.0 - rho)
            noise = jnp.sqrt(jnp.maximum(Dg * rho * (1.0 - rho), 0.0)) * eta
            f = bgk(f, feq, omega) + w * (grow + noise)
            f = jnp.maximum(f, 0.0)  # negativity clip (D2Q9_diffusion.cl:163)
            return (f, key)

        return step

    def get_fields(self):
        f, _ = self.state
        rho = density(f)
        feq = feq_linear(rho, self.u, self.v)
        return {
            "f": self._to_host_xy(f),
            "feq": self._to_host_xy(jnp.broadcast_to(feq, f.shape)),
            "rho": self._to_host_xy(rho),
            "u": self._to_host_xy(jnp.broadcast_to(self.u, rho.shape)),
            "v": self._to_host_xy(jnp.broadcast_to(self.v, rho.shape)),
        }
