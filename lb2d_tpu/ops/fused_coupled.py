"""Fused kernels for the coupled two-field families (surfactant-nutrient
waves, rocket yeast) on the generic halo machinery of
:mod:`lb2d_tpu.ops.fused_mc`.

The reference runs these as 6-8 sequential OpenCL kernels per step with
local-memory halo tiles for the pseudo-force / gradient stencils
(``surfactant_nutrient_waves.cl:283-364``, ``rocket_yeast.cl:233-399``);
round 1 ported them as XLA rolls only. Here each family gets ONE fused
kernel per sweep:

* :func:`make_rocket_yeast_step` — the whole step is local (the advection
  velocity *is* a one-belt gradient of the surfactant,
  ``rocket_yeast.cl:316-399``; the Shan-Chen pseudo-force is one-belt too,
  ``:233-315``), so the kernel is temporally blocked K LB steps per HBM
  sweep like the multicomponent engine. Covers both variants:
  ``forces_only=False`` (velocity = -eps grad(surfactant), pseudo-force in
  the collision, ``rocket_yeast.cl:74-151``) and ``forces_only=True``
  (velocity = surface-tension + pressure force fields directly,
  ``rocket_yeast_forces_only.cl:45-62, 225-316``; no collision force).
* :func:`make_surfactant_step` — the advection velocity comes from a
  *global* screened-Poisson solve of the population density each step
  (``surfactant_nutrient_waves.py:373-397``), so it enters as a
  precomputed 2-plane external input and the kernel runs K=1; the growth
  coupling (``surfactant_nutrient_waves.cl:74-128``) and the Clumpy
  variant's Shan-Chen pseudo-force (``:130-199, 242-364``) fuse in-kernel.

All stencils are evaluated separably (:func:`~lb2d_tpu.ops.fused_mc.
separable_belt_force` — the D2Q9 belt weights are an outer product).
Plane layout matches the models' flattened state: plane ``j*2 + field``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.lattice import D2Q9
from .fused_mc import (
    _make_halo_kernel,
    _ring_bytes,
    _VMEM_BUDGET,
    max_mc_k,
    separable_belt_force,
)

__all__ = [
    "pick_coupled_tiling",
    "make_rocket_yeast_step",
    "make_surfactant_step",
    "make_screened_fisher_step",
]

POP = 0


def pick_coupled_tiling(H: int, nx: int, belt: int = 1, n_ext: int = 0,
                        k_steps: int | None = None, emit: int = 0,
                        C: int = 2):
    """(CH, K) for a coupled-family kernel — same rules as the
    multicomponent picker (the ext-ring estimate with ``has_ext`` sizes
    ``2 C`` ext planes, an overestimate for the 2-plane velocity input:
    conservative). ``C``: plane-count fields (1 for the screened-Fisher
    kernel — sizing it at 2 halved the feasible temporal depth at
    8192^2). ``emit``: density-emit plane count (budgets the D-stage's
    register-spill scratch like
    :func:`~lb2d_tpu.ops.fused_mc.pick_mc_tiling`)."""
    if nx % 128 != 0:
        return None
    for k in ((8, 6, 5, 4, 3, 2, 1) if k_steps is None else (k_steps,)):
        for ch in (16, 8):
            if H % ch or H // ch < 3:
                continue
            if k > max_mc_k(ch, belt):
                continue
            if emit and k * (1 + belt) > ch - 1:
                continue
            rb = _ring_bytes(ch, nx, C, k, n_ext > 0, emit=emit)
            if emit:
                if rb + 40 * ch * nx * 4 <= _VMEM_BUDGET:
                    return ch, k
            elif rb <= _VMEM_BUDGET:
                return ch, k
    return None


def _coef9(u, v):
    """``(1 + 3 c_j . u)`` — the linear feq coefficient
    (``surfactant_nutrient_waves.cl:1-44``) — for all 9 D2Q9 directions,
    pair-factored."""
    t1 = 3.0 * u
    t2 = 3.0 * v
    t5 = t1 + t2
    t8 = t1 - t2
    return [1.0, 1.0 + t1, 1.0 + t2, 1.0 - t1, 1.0 - t2,
            1.0 + t5, 1.0 - t8, 1.0 - t5, 1.0 + t8]


def _cdot9(fx, fy):
    """``c_j . F`` for all 9 directions (pair-factored)."""
    s = fx + fy
    d = fx - fy
    return [None, fx, fy, -fx, -fy, s, -d, -s, d]


def make_rocket_yeast_step(
    *,
    H: int,
    nx: int,
    omega: float,
    omega_c: float,
    lb_G: float,
    lb_Gc: float,
    epsilon: float,
    rho_o: float,
    G_chen: float,
    forces_only: bool = False,
    c_o: float = 0.25,
    alpha: float = 2.0,
    dtype=jnp.float32,
    interpret: bool = False,
    chunk: int | None = None,
    k_steps: int | None = None,
    x_ext: int = 0,
    body_w: int | None = None,
):
    """Fused K-step kernel for :class:`~lb2d_tpu.models.rocket_yeast.
    RocketYeast` / ``RocketYeastForcesOnly``. State planes ``j*2 + field``
    (field 0 population, 1 surfactant); halos as in the mc kernel."""
    lattice = D2Q9
    q = lattice.q
    ws = lattice.w
    cs2 = lattice.cs2
    belt = 1
    tiling = pick_coupled_tiling(H, nx, belt, 0, k_steps)
    if tiling is None:
        raise ValueError(f"no rocket-yeast tiling for {H}x{nx}")
    CH, K = (chunk or tiling[0]), (k_steps or tiling[1])
    b = belt
    A = 1.0 - omega
    A_c = 1.0 - omega_c
    ialpha = int(alpha)
    int_alpha = float(ialpha) == float(alpha) and 1 <= ialpha <= 4

    def phys(fs, rho, rho_ext, ext):
        pe_pop, pe_surf = rho_ext[0], rho_ext[1]
        if forces_only:
            # velocity = surface-tension + pressure force fields
            # (rocket_yeast_forces_only.cl:45-62, 225-316)
            c = jnp.maximum(pe_surf, 0.0)
            base = 1.0 - jnp.exp(-c / c_o)
            if int_alpha:
                S = base
                for _ in range(ialpha - 1):
                    S = S * base
            else:
                S = jnp.maximum(base, 1e-30) ** alpha
            sx, sy = separable_belt_force(S, b, CH, nx)
            gx, gy = separable_belt_force(pe_pop, b, CH, nx)
            pref = (-G_chen / cs2) * (rho[POP] - rho_o)
            u = (-epsilon / cs2) * sx + pref * gx
            v = (-epsilon / cs2) * sy + pref * gy
            Fx = Fy = None
        else:
            # velocity = -eps grad(surfactant) (rocket_yeast.cl:316-399)
            gx, gy = separable_belt_force(pe_surf, b, CH, nx)
            u = (-epsilon / cs2) * gx
            v = (-epsilon / cs2) * gy
            # Shan-Chen pseudo-force on the population
            # (rocket_yeast.cl:233-315): F = -cs2 G_chen psi sum w c psi(+c)
            psie = rho_o * (1.0 - jnp.exp(-jnp.maximum(pe_pop, 0.0)
                                          / rho_o))
            pfx, pfy = separable_belt_force(psie, b, CH, nx)
            pref = (-cs2 * G_chen) * psie[b:b + CH]
            Fx, Fy = pref * pfx, pref * pfy

        coef = _coef9(u, v)
        rp, rs = rho[0], rho[1]
        growth = lb_G * rp * (1.0 - rp)      # rocket_yeast.cl:110-121
        produce = lb_Gc * rp                 # surfactant production
        cF = _cdot9(3.0 * Fx, 3.0 * Fy) if Fx is not None else None
        out = [[None, None] for _ in range(q)]
        for j in range(q):
            wj = ws[j]
            p = fs[0][j] * A + (omega * wj) * rp * coef[j] + wj * growth
            if cF is not None:
                if j == 0:
                    pass  # c_0 . F = 0
                else:
                    p = p + wj * cF[j]
            # negativity clip (rocket_yeast.cl:127)
            out[j][0] = jnp.maximum(p, 0.0)
            out[j][1] = (fs[1][j] * A_c + (omega_c * wj) * rs * coef[j]
                         + wj * produce)
        return [[out[j][i] for j in range(q)] for i in range(2)]

    return _make_halo_kernel(
        H=H, nx=nx, C=2, CH=CH, K=K, belt=belt, n_ext=0, phys=phys,
        dtype=dtype, interpret=interpret, flops_per_cell=400,
        x_ext=x_ext, body_w=body_w)


def make_screened_fisher_step(
    *,
    H: int,
    nx: int,
    omega: float,
    lb_G: float,
    dtype=jnp.float32,
    interpret: bool = False,
    chunk: int | None = None,
    k_steps: int = 1,
    emit: bool = False,
    ext_halos: bool = False,
    x_ext: int = 0,
    body_w: int | None = None,
):
    """Fused kernel for :class:`~lb2d_tpu.models.waves.
    ScreenedFisherWave`: one field, linear feq on the externally-supplied
    screened-Poisson velocity (2 ext planes), Fisher source
    (``screened_poisson_waves.py:373-387``). K=1 is exact (the velocity is
    re-solved every step, as in the reference); ``k_steps>1`` is the
    documented *sweep-stale* mode — the velocity planes are held constant
    for K internal steps, amortizing the global solve (the ext ring
    machinery applies them identically at every stage). ``emit=True``
    adds the density-emit output (the next step/sweep's solve input; see
    :func:`~lb2d_tpu.ops.fused_mc._make_halo_kernel`)."""
    lattice = D2Q9
    q = lattice.q
    ws = lattice.w
    tiling = pick_coupled_tiling(H, nx, 0, 2, k_steps, emit=int(emit), C=1)
    if tiling is None:
        raise ValueError(f"no screened-fisher tiling for {H}x{nx}")
    CH = chunk or tiling[0]
    A = 1.0 - omega

    def phys(fs, rho, rho_ext, ext):
        u, v = ext[0], ext[1]
        coef = _coef9(u, v)
        r = rho[0]
        react = lb_G * r * (1.0 - r)
        return [[fs[0][j] * A + (omega * ws[j]) * r * coef[j]
                 + ws[j] * react for j in range(q)]]

    return _make_halo_kernel(
        H=H, nx=nx, C=1, CH=CH, K=k_steps, belt=0, n_ext=2, phys=phys,
        dtype=dtype, interpret=interpret, flops_per_cell=120,
        emit_src=(0,) if emit else (), ext_halos=ext_halos,
        x_ext=x_ext, body_w=body_w)


def make_surfactant_step(
    *,
    H: int,
    nx: int,
    omega: float,
    omega_n: float,
    lb_G: float,
    clumpy: bool = False,
    rho_o: float = 1.0,
    G_chen: float = -1.0,
    dtype=jnp.float32,
    interpret: bool = False,
    chunk: int | None = None,
    k_steps: int = 1,
    emit: bool = False,
    ext_halos: bool = False,
    x_ext: int = 0,
    body_w: int | None = None,
):
    """Fused kernel for :class:`~lb2d_tpu.models.surfactant.
    SurfactantNutrientWave` / ``ClumpySurfactantNutrientWave``. The
    advection velocity (from the global screened-Poisson solve) enters as
    ``g_ext = [u, v]`` planes; K=1 re-solves it every step (exact,
    reference semantics); ``k_steps>1`` is the documented sweep-stale mode
    (velocity frozen for K internal steps). Plane layout ``j*2 + field``
    (0 population, 1 nutrient). ``emit=True`` adds the population-density
    emit output (the next step/sweep's solve input)."""
    lattice = D2Q9
    q = lattice.q
    ws = lattice.w
    cs2 = lattice.cs2
    belt = 1 if clumpy else 0
    tiling = pick_coupled_tiling(H, nx, belt, 2, k_steps, emit=int(emit))
    if tiling is None:
        raise ValueError(f"no surfactant tiling for {H}x{nx}")
    CH = chunk or tiling[0]
    b = belt
    A = 1.0 - omega
    A_n = 1.0 - omega_n

    def phys(fs, rho, rho_ext, ext):
        u, v = ext[0], ext[1]
        coef = _coef9(u, v)
        rp, rn = rho[0], rho[1]
        # growth G rho n: + population, - nutrient
        # (surfactant_nutrient_waves.cl:94-127)
        growth = lb_G * rp * rn
        if clumpy:
            # Shan-Chen clumping on the population (:130-199, 242-364)
            psie = rho_o * (1.0 - jnp.exp(-jnp.maximum(rho_ext[POP], 0.0)
                                          / rho_o))
            pfx, pfy = separable_belt_force(psie, b, CH, nx)
            pref = (-cs2 * G_chen) * psie[b:b + CH]
            cF = _cdot9(3.0 * pref * pfx, 3.0 * pref * pfy)
        else:
            cF = None
        out = [[None, None] for _ in range(q)]
        for j in range(q):
            wj = ws[j]
            p = fs[0][j] * A + (omega * wj) * rp * coef[j] + wj * growth
            if cF is not None and j > 0:
                p = p + wj * cF[j]
            out[j][0] = p
            out[j][1] = (fs[1][j] * A_n + (omega_n * wj) * rn * coef[j]
                         - wj * growth)
        return [[out[j][i] for j in range(q)] for i in range(2)]

    return _make_halo_kernel(
        H=H, nx=nx, C=2, CH=CH, K=k_steps, belt=belt, n_ext=2, phys=phys,
        dtype=dtype, interpret=interpret, flops_per_cell=250,
        emit_src=(POP,) if emit else (), ext_halos=ext_halos,
        x_ext=x_ext, body_w=body_w)
