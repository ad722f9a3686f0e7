"""Fused, temporally-blocked Pallas kernel for the multicomponent /
porous-media engine.

The reference's largest native subsystem (``single_component.cl``, 967 lines;
``multi.cl``, 947) runs one step as ~10 sequential kernel launches per fluid
(``single_component.py:679-751``), each a full HBM round trip. The XLA port
in :mod:`lb2d_tpu.models.multicomponent` is correct but roll-based (~500
MLUPS at 512^2). This module fuses the entire step — stream, hydro,
Shan-Chen interaction forces, porous drag, barycentric velocity, Guo-forced
BGK, eating/growth collisions — into ONE kernel, and **temporally blocks**
``k_steps`` LB steps into each HBM sweep (the round-3 in-jit profile
measured the K=1 ring at 594 GB/s — the XLA elementwise copy ceiling —
with the physics fully DMA-hidden; blocking still divides the ring
traffic by K exactly as the flow kernel's temporal path does,
``ops/fused.py``).

Structure: a ``2K``-stage software pipeline over CH-row chunks. Per LB step
``s`` there are two sub-stages, skewed two chunks apart so every read is
already resident in VMEM:

* **stream S_s** (virtual chunk ``c`` at iteration ``c + 2s``): pull-stream
  all ``q*C`` planes from step ``s-1``'s output ring (step 0 streams from
  the HBM input ring; y-halo rows come from ring chunks ``c-1`` / ``c+1``,
  x from lane rolls) and reduce the per-fluid post-stream density.
* **physics P_s** (chunk ``c`` at iteration ``c + 2s + 1``, after S_s has
  produced chunk ``c+1``'s densities): per-fluid momenta, Shan-Chen
  pseudopotential forces with in-VMEM halo rows (first belt
  ``single_component.cl:652-793`` — evaluated *separably*, the D2Q9 belt
  weights are ``outer([1/6, 2/3, 1/6])`` — or the two-belt 25-vector
  stencil ``:795-967``), constant/gravity forces, porous Darcy+Forchheimer
  drag (``:276-335``), barycentric velocity (``:161-212``), porosity feq
  (``:39-60``) + Guo forcing (``:104-113`` / ``multi.cl:115-126``) + BGK,
  and the eating (``single_component.cl:120-159``) / growth
  (``multi.cl:182-220``) hooks. Output goes to step ``s``'s ring, or to the
  HBM output for ``s = K-1``.

Like :mod:`fused_halo`, the kernel operates on a local y-shard ``[q*C, H,
nx]`` plus one CH-row halo chunk per side, so the same kernel serves the
unsharded case (halos = the local periodic wrap rows) and ``shard_map``
(halos ``ppermute``d over ICI). Halo chunks run every stage but are never
stored; each stage corrupts their outermost rows a little further (stale
ring slots at the block edge): after P_s the outer ``(1 + belt)(s + 1)``
rows are garbage, and the first/last body chunk reads at most ``belt``
rows (rho) / 1 row (streamed f) in — valid while
``(K - 1)(1 + belt) <= CH - belt - 1`` (:func:`max_mc_k`).

Scope (the model falls back to the XLA path otherwise): D2Q9, periodic BCs,
fp32. Global force hooks (the screened-Poisson repulsion of
``multi.py:488-511``) cannot fuse — their FFT is a global dependency — so
they enter as a precomputed per-fluid force-field input ``g_ext`` streamed
through its own ring, and force ``k_steps = 1`` (the field is only valid
for the step it was computed from); static force fields (radial body
forces) are step-invariant and allow any K.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.lattice import D2Q9
from .fused import _lane_roll

__all__ = [
    "MCKernelConfig",
    "FluidParams",
    "supports_mc_halo",
    "pick_mc_tiling",
    "max_mc_k",
    "make_mc_halo_step",
]

_NIN = 5    # HBM input ring depth (loads run 3 chunks ahead)
_NFS = 2    # streamed-f ring depth (written S_s, read P_s next iteration)
_NRHO = 4   # density ring depth (P_s reads chunks c-1, c, c+1)
# Per-step output ring depth. S_{s+1}(c) reads chunks c-1..c+1 of
# fo_rings[s]; the writer P_s(c+1) commits earlier in the SAME body
# iteration (the stage loop runs s before s+1), and slot (c-1) % _NFO is
# only rewritten by chunk c-1+_NFO two iterations after the last read at
# depth 3 — so 3 slots suffice. Depth is the dominant VMEM term at large
# nx (18 planes per temporal stage): 3 instead of 4 is what lets K=3 fit
# at 8192^2 2-fluid.
_NFO = 3
_NOUT = 2   # HBM output ring depth
_NEDGE = 3  # first/last-row ring depth for the density-emit stage
_VMEM_BUDGET = 102 * 1024 * 1024
_VMEM_LIMIT = 124 * 1024 * 1024   # pallas_call cap (v5e VMEM is 128 MB;
# the K=3 8192^2 2-fluid ext config needs 118.9 MB = 100.5 MB rings +
# ~18 MB compiler stack scratch)


@dataclass(frozen=True)
class FluidParams:
    """Static per-fluid parameters (``Pourous_Media.__init__``,
    ``single_component.py:46-67``)."""
    omega: float
    epsilon: float = 1.0
    nu_fluid: float = 1.0
    K: float = 1.0
    Fe: float = 1.0


@dataclass(frozen=True)
class MCKernelConfig:
    """Everything the kernel needs at trace time.

    ``interactions``: tuples ``(i1, i2, G_int, spec, params, belt)`` with
    ``spec`` the pseudopotential index (0 linear / 1 shan_chen / 2 pow /
    3 vdw, ``single_component.cl:609-651``) and ``belt`` 1 or 2.
    ``const_forces``: ``(i, fx, fy)`` scalar adds (``:547-570``).
    ``const_g``: ``(i, gx, gy)`` force density ``g * rho``
    (``multi.cl:541-566``).
    ``collisions``: ``("eating", i, j, rate)`` or ``("growth", i, lo, hi,
    rate)``.
    """
    fluids: tuple  # tuple[FluidParams, ...]
    porous: bool
    zero_density: float
    interactions: tuple = ()
    const_forces: tuple = ()
    const_g: tuple = ()
    collisions: tuple = ()
    has_ext: bool = False

    @property
    def belt(self) -> int:
        return max((it[5] for it in self.interactions), default=0)


def _psi_pair(spec, r1, r2, params, zd):
    """In-kernel pseudopotentials (``single_component.cl:609-651``); pure
    jnp so it lowers in both compiled and interpret mode."""
    if spec == 0:
        return r1, r2
    if spec == 1:
        rho_0 = params[0]
        return (rho_0 * (1.0 - jnp.exp(-r1 / rho_0)),
                rho_0 * (1.0 - jnp.exp(-r2 / rho_0)))
    if spec == 2:
        a = params[0]
        p1 = jnp.where(r1 > zd, jnp.maximum(r1, zd) ** a, 0.0)
        p2 = jnp.where(r2 > zd, jnp.maximum(r2, zd) ** a, 0.0)
        return p1, p2
    if spec == 3:
        a, b, T, cs = params[:4]
        P1 = (r1 * T) / (1.0 - r1 * b) - a * r1 * r1
        P2 = (r2 * T) / (1.0 - r2 * b) - a * r2 * r2
        cs2 = cs * cs
        s1 = jnp.sqrt(jnp.maximum(2.0 * (P1 - cs2 * r1) / cs2, 0.0))
        s2 = jnp.sqrt(jnp.maximum(2.0 * (P2 - cs2 * r2) / cs2, 0.0))
        return s1, s2
    raise ValueError(f"unknown PSI specifier {spec}")


def max_mc_k(CH: int, belt: int, reach: int = 1) -> int:
    """Largest temporal depth the one-chunk halo supports: corruption of a
    halo chunk's outer rows grows by ``reach + belt`` per LB step (reach =
    the lattice's max |c_y|, 1 for D2Q9 / 2 for D2Q25), and the first/last
    body chunk reads ``belt`` density rows into the halo chunk at every
    step: ``(K - 1)(reach + belt) <= CH - belt - reach``."""
    return max(1, (CH - belt - reach) // (reach + belt) + 1)


def _ring_bytes(CH, nx, C, K, has_ext, q=9, emit=0, n_ext=None):
    P = q * C
    plane = CH * nx * 4
    planes = (_NIN * P + K * (_NFS * P + _NRHO * C)
              + (K - 1) * _NFO * P + _NOUT * P)
    if has_ext:
        planes += (2 * K + 3) * (2 * C if n_ext is None else n_ext)
    if emit:
        # rho-out ring + the two (first/last)-row rings (sublane-padded)
        planes += _NOUT * emit
        planes += -(-(2 * _NEDGE * (-(-emit * q // 8) * 8)) // CH)
    return planes * plane


def pick_mc_tiling(H: int, nx: int, C_fluids: int, belt: int = 1,
                   has_ext: bool = False,
                   k_steps: int | None = None,
                   q: int = 9, reach: int = 1,
                   emit: int = 0,
                   n_ext: int | None = None) -> tuple[int, int] | None:
    """Pick ``(CH, K)``: deepest temporal block first (ring traffic divides
    by K), largest chunk second; 8-row DMA alignment, >= 3 body chunks,
    VMEM within budget, halo-validity cap :func:`max_mc_k` (one step
    tighter when emitting density — the D stage reads the halo chunks'
    final-output inner rows, see :func:`_make_halo_kernel`)."""
    if nx % 128 != 0:
        return None
    for k in ((8, 6, 5, 4, 3, 2, 1) if k_steps is None else (k_steps,)):
        for ch in (16, 8):
            if H % ch or H // ch < 3:
                continue
            if k > max_mc_k(ch, belt, reach):
                continue
            if emit and k * (reach + belt) > ch - 1:
                continue
            rb = _ring_bytes(ch, nx, C_fluids, k, has_ext, q, emit,
                             n_ext=n_ext)
            if emit:
                # the phys-unroll + D-stage register spill scratch is
                # CH-proportional (~70 chunk-planes measured at 8192^2
                # 2-fluid D2Q9 first-belt, i.e. ~2 planes per live
                # physics plane C*q*(1+belt) = 36); scale the estimate
                # with the physics size so bigger configs (D2Q25, more
                # fluids, second belt) don't get admitted on a budget
                # calibrated to a smaller kernel (ADVICE r3 #2)
                spill = max(70, (70 * C_fluids * q * (1 + belt)) // 36)
                if rb + spill * ch * nx * 4 <= _VMEM_LIMIT:
                    return ch, k
            elif rb <= _VMEM_BUDGET:
                return ch, k
    return None


def supports_mc_halo(H: int, nx: int, C_fluids: int, belt: int = 1,
                     has_ext: bool = False, q: int = 9,
                     reach: int = 1, emit: int = 0,
                     n_ext: int | None = None) -> bool:
    return pick_mc_tiling(H, nx, C_fluids, belt, has_ext, q=q, reach=reach,
                          emit=emit, n_ext=n_ext) is not None


def _make_halo_kernel(
    *,
    H: int,
    nx: int,
    C: int,
    CH: int,
    K: int,
    belt: int,
    n_ext: int,
    phys,
    dtype=jnp.float32,
    interpret: bool = False,
    flops_per_cell: int = 600,
    lattice=D2Q9,
    emit_src: tuple = (),
    x_ext: int = 0,
    body_w: int | None = None,
    ext_halos: bool = False,
):
    """Generic 2K-stage chunk-pipelined halo kernel over ``q*C`` planes.

    ``ext_halos``: the step takes two extra inputs ``ext_top``/``ext_bot``
    (``[n_ext, CH, nx]``) holding the y-neighbors' boundary ext rows, and
    the halo chunks' ext loads come from them instead of the shard-local
    wrap — REQUIRED for ``K > 1`` with per-shard ext fields on a sharded
    mesh (the local wrap is the true field only on an unsharded shard).

    The machinery (VMEM rings, DMA schedule, stage skew, halo-chunk
    processing — see the module docstring) is physics-agnostic; the
    stage-1 callback supplies the model::

        phys(fs, rho, rho_ext, ext) -> out

    with ``fs[C][q]`` streamed chunk planes, ``rho[C]`` post-stream
    densities, ``rho_ext[C]`` the (CH + 2*belt)-row density windows
    (``None`` when ``belt == 0``), and ``ext`` a list of ``n_ext``
    per-chunk external input planes; returns ``out[C][q]``.

    ``emit_src`` (fluid indices, D2Q9 only) adds a density-emit stage
    ``D``: one skew after the final physics stage, the kernel pull-streams
    its own final output for those fluids and writes the resulting
    densities as a second output ``[len(emit_src), H, nx]`` — the NEXT
    step's post-stream density, i.e. exactly the field a dynamic-force
    hook (the screened-Poisson repulsion, ``multi.py:488-511``) needs as
    its input. Emitting it here removes both the XLA density pass over
    ``f`` and the protective full-buffer copy XLA otherwise inserts
    around the aliased in-place kernel (``f`` keeps a second consumer).
    ``D(c)`` reads chunk ``c`` from the out ring plus single boundary
    rows from two tiny first/last-row rings, so ring depths are
    unchanged; the halo chunks' final outputs supply the periodic wrap
    rows (their inner rows — valid while ``K (reach + belt) <= CH - 1``,
    one step tighter than :func:`max_mc_k`).

    ``x_ext`` (2-D meshes): ``nx`` is the WORKING width ``body_w +
    2*x_ext`` — every input arrives x-halo-extended with one 128-lane
    strip ppermuted from each x-neighbor (cut from the y-extended arrays
    so diagonal corners arrive in two hops, as in
    :func:`lb2d_tpu.parallel.sharded.make_sharded_temporal_step`). Lane
    rolls wrap at the extended width; the wrap corruption creeps
    ``1 + belt`` lanes per internal step from each strip edge, so the
    stored body lanes stay exact while ``K (1 + belt) <= 128``. The
    output is the ``body_w`` body lanes only (no in-place aliasing: the
    extended input is a fresh concat each call anyway). Incompatible
    with ``emit_src``.

    Used by the multicomponent engine (:func:`make_mc_halo_step`) and the
    surfactant / rocket-yeast kernels (:mod:`lb2d_tpu.ops.fused_coupled`).
    """
    q = lattice.q
    reach = int(max(max(abs(c) for c in lattice.cy), 1))
    BX = int(x_ext)
    W = int(body_w) if body_w is not None else nx
    if BX:
        assert not emit_src, "x-extended kernel cannot emit density"
        assert BX == 128 and W % 128 == 0 and W >= 128
        assert nx == W + 2 * BX, (nx, W, BX)
        assert K * (1 + belt) <= BX
    if H % CH or K > max_mc_k(CH, belt, reach):
        raise ValueError(f"invalid halo tiling {H}x{nx} CH={CH} K={K}")
    assert belt + 2 <= CH or belt == 0, (belt, CH)
    if emit_src:
        if any(abs(c) > 1 for c in lattice.cy) or reach != 1:
            raise ValueError("density emit needs a reach-1 lattice (D2Q9)")
        if K * (reach + belt) > CH - 1:
            raise ValueError(
                f"density emit: K={K} too deep for CH={CH} (halo-output "
                "inner rows must stay valid)")
    Cb = H // CH      # body chunks
    V = Cb + 2        # virtual chunks incl. the two halo chunks
    P = q * C
    NE = 2 * K + 3    # ext ring depth: ext[c] is read by every P_s
    has_ext = n_ext > 0
    S = len(emit_src)
    SQ = -(-S * q // 8) * 8 if S else 0   # sublane-padded row count
    cxs, cys = lattice.cx, lattice.cy

    EH = bool(ext_halos) and has_ext

    def kernel(*refs):
        nin = (6 if EH else 4) if has_ext else 3
        f_hbm, top_hbm, bot_hbm = refs[:3]
        ext_hbm = refs[3] if has_ext else None
        ext_top_hbm = refs[4] if EH else None
        ext_bot_hbm = refs[5] if EH else None
        out_hbm = refs[nin]
        rho_hbm = refs[nin + 1] if S else None
        rest = refs[nin + (2 if S else 1):]
        idx = 0
        in_ring = rest[idx]; idx += 1
        fs_rings = rest[idx:idx + K]; idx += K
        rho_rings = rest[idx:idx + K]; idx += K
        fo_rings = rest[idx:idx + K - 1]; idx += K - 1
        out_ring = rest[idx]; idx += 1
        if has_ext:
            ext_ring = rest[idx]; idx += 1
        else:
            ext_ring = None
        if S:
            rho_out_ring = rest[idx]; idx += 1
            edge_ring = rest[idx]; idx += 1    # last output row per chunk
            first_ring = rest[idx]; idx += 1   # first output row per chunk
        sems = rest[idx:]
        sem_in = sems[0]
        sems = sems[1:]
        if has_ext:
            sem_ext = sems[0]
            sems = sems[1:]
        sem_out = sems[0]
        sem_rho = sems[1] if S else None

        def load(c):
            """DMA virtual chunk c: 0 -> top halo, 1..Cb -> f_loc chunk c-1,
            V-1 -> bottom halo (one wait descriptor serves all three)."""
            slot = c % _NIN

            @pl.when(c == 0)
            def _():
                pltpu.make_async_copy(
                    top_hbm, in_ring.at[slot], sem_in.at[slot]).start()

            @pl.when((c >= 1) & (c <= Cb))
            def _():
                pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(
                        pl.multiple_of((c - 1) * CH, CH), CH), :],
                    in_ring.at[slot], sem_in.at[slot]).start()

            @pl.when(c == V - 1)
            def _():
                pltpu.make_async_copy(
                    bot_hbm, in_ring.at[slot], sem_in.at[slot]).start()

            if has_ext and EH:
                # halo chunks' ext rows come from the ppermuted neighbor
                # chunks (sharded callers at K > 1)
                @pl.when(c == 0)
                def _():
                    pltpu.make_async_copy(
                        ext_top_hbm, ext_ring.at[c % NE],
                        sem_ext.at[c % NE]).start()

                @pl.when((c >= 1) & (c <= Cb))
                def _():
                    pltpu.make_async_copy(
                        ext_hbm.at[:, pl.ds(
                            pl.multiple_of((c - 1) * CH, CH), CH), :],
                        ext_ring.at[c % NE], sem_ext.at[c % NE]).start()

                @pl.when(c == V - 1)
                def _():
                    pltpu.make_async_copy(
                        ext_bot_hbm, ext_ring.at[c % NE],
                        sem_ext.at[c % NE]).start()
            elif has_ext:
                # ext chunks load for the HALO chunks too (their stage-s
                # physics feeds later stages' stream halos at K >= 2): the
                # physics is periodic, so halo ext rows are the local wrap
                # (chunk 0 <- last CH rows, chunk V-1 <- first CH rows).
                # Sharded callers use ext_halos (K > 1) or stay at K=1.
                cc = jnp.asarray(c)
                start = jnp.where(
                    cc == 0, H - CH,
                    jnp.where(cc == V - 1, 0, (cc - 1) * CH))
                pltpu.make_async_copy(
                    ext_hbm.at[:, pl.ds(
                        pl.multiple_of(start, CH), CH), :],
                    ext_ring.at[c % NE], sem_ext.at[c % NE]).start()

        def load_wait(c):
            slot = c % _NIN
            pltpu.make_async_copy(
                top_hbm, in_ring.at[slot], sem_in.at[slot]).wait()
            if has_ext:
                # every virtual chunk now carries an ext DMA (see load)
                pltpu.make_async_copy(
                    ext_hbm.at[:, pl.ds(0, CH), :],
                    ext_ring.at[c % NE], sem_ext.at[c % NE]).wait()

        def store(c):
            src = out_ring.at[c % _NOUT]
            if BX:   # extended working width: commit the body lanes only
                src = out_ring.at[c % _NOUT, :, :, pl.ds(BX, W)]
            return pltpu.make_async_copy(
                src,
                out_hbm.at[:, pl.ds(
                    pl.multiple_of((c - 1) * CH, CH), CH), :],
                sem_out.at[c % _NOUT])

        def stream_stage(s, c):
            """S_s: stream chunk c of step s (pull from ring chunks
            c-1/c/c+1 + lane rolls) and reduce per-fluid density. Halo
            chunks stream too (their outermost rows read stale slots and
            are garbage — tracked by :func:`max_mc_k`, never stored)."""
            ring = in_ring if s == 0 else fo_rings[s - 1]
            depth = _NIN if s == 0 else _NFO
            prev = (c - 1) % depth
            cur = c % depth
            nxt = (c + 1) % depth
            for i in range(C):
                rho = None
                for j in range(q):
                    pi = j * C + i
                    cxj, cyj = cxs[j], cys[j]
                    if cyj > 0:
                        rows = jnp.concatenate(
                            [ring[prev, pi, CH - cyj:CH, :],
                             ring[cur, pi, 0:CH - cyj, :]], axis=0)
                    elif cyj < 0:
                        rows = jnp.concatenate(
                            [ring[cur, pi, -cyj:CH, :],
                             ring[nxt, pi, 0:-cyj, :]], axis=0)
                    else:
                        rows = ring[cur, pi, :, :]
                    sj = _lane_roll(rows, cxj, nx)
                    fs_rings[s][c % _NFS, pi, :, :] = sj
                    rho = sj if rho is None else rho + sj
                rho_rings[s][c % _NRHO, i, :, :] = rho

        def phys_stage(s, c):
            """P_s: stage-1 physics callback for chunk c of step s, then
            route the result to step s's ring or the HBM output."""
            fs_ring = fs_rings[s]
            rho_ring = rho_rings[s]
            fs = [[fs_ring[c % _NFS, j * C + i, :, :] for j in range(q)]
                  for i in range(C)]
            b = belt
            rho, rho_ext = [], None
            if b:
                rho_ext = []
                for i in range(C):
                    rho_ext.append(jnp.concatenate([
                        rho_ring[(c - 1) % _NRHO, i, CH - b:CH, :],
                        rho_ring[c % _NRHO, i, :, :],
                        rho_ring[(c + 1) % _NRHO, i, 0:b, :]], axis=0))
                    rho.append(rho_ext[i][b:b + CH])
            else:
                for i in range(C):
                    rho.append(rho_ring[c % _NRHO, i, :, :])
            ext = ([ext_ring[c % NE, e, :, :] for e in range(n_ext)]
                   if has_ext else None)

            out = phys(fs, rho, rho_ext, ext)

            if s < K - 1:
                for i in range(C):
                    for j in range(q):
                        fo_rings[s][c % _NFO, j * C + i, :, :] = out[i][j]
            else:
                if S:
                    # boundary rows of EVERY chunk's final output (incl.
                    # the halo chunks: their inner rows are the periodic
                    # wrap for the density-emit stage)
                    for si, i in enumerate(emit_src):
                        for j in range(q):
                            sq = si * q + j
                            edge_ring[c % _NEDGE, sq:sq + 1, :] = \
                                out[i][j][CH - 1:CH, :]
                            first_ring[c % _NEDGE, sq:sq + 1, :] = \
                                out[i][j][0:1, :]

                @pl.when((c >= 1) & (c <= Cb))
                def _():
                    @pl.when(c >= _NOUT + 1)
                    def _():
                        store(c - _NOUT).wait()

                    for i in range(C):
                        for j in range(q):
                            out_ring[c % _NOUT, j * C + i, :, :] = out[i][j]
                    store(c).start()

        def store_rho(c):
            return pltpu.make_async_copy(
                rho_out_ring.at[c % _NOUT],
                rho_hbm.at[:, pl.ds(
                    pl.multiple_of((c - 1) * CH, CH), CH), :],
                sem_rho.at[c % _NOUT])

        def density_stage(c):
            """D: pull-stream the FINAL output (chunk c from the out ring,
            boundary rows from the first/last-row rings) and reduce the
            emit fluids' densities — the next step's post-stream density,
            summed in build_ext's roll order so the emitted field is
            bit-identical to the XLA pass it replaces. Runs BEFORE this
            iteration's physics stages: P_{K-1}(c+2) reuses out-ring slot
            c % _NOUT."""
            cur = c % _NOUT
            ep = (c - 1) % _NEDGE
            fp = (c + 1) % _NEDGE

            @pl.when(c >= _NOUT + 1)
            def _():
                store_rho(c - _NOUT).wait()

            for si, i in enumerate(emit_src):
                rho = None
                for j in range(q):
                    pi = j * C + i
                    cxj, cyj = cxs[j], cys[j]
                    sq = si * q + j
                    if cyj > 0:     # reach == 1: cyj is +1
                        rows = jnp.concatenate(
                            [edge_ring[ep, sq:sq + 1, :],
                             out_ring[cur, pi, 0:CH - 1, :]], axis=0)
                    elif cyj < 0:
                        rows = jnp.concatenate(
                            [out_ring[cur, pi, 1:CH, :],
                             first_ring[fp, sq:sq + 1, :]], axis=0)
                    else:
                        rows = out_ring[cur, pi, :, :]
                    sj = _lane_roll(rows, cxj, nx)
                    rho = sj if rho is None else rho + sj
                rho_out_ring[c % _NOUT, si, :, :] = rho
            store_rho(c).start()

        # prologue: three loads in flight
        load(0)
        load(1)
        load(2)

        def body(k, _):
            @pl.when(k == 0)
            def _():
                load_wait(0)

            @pl.when(k + 1 < V)
            def _():
                load_wait(k + 1)

            if S:
                # D(c) at iteration c + 2K + 1, BEFORE the physics stages
                # (P_{K-1}(c+2) overwrites out-ring slot c % _NOUT this
                # same iteration)
                @pl.when((k >= 2 * K + 2) & (k - 2 * K - 1 <= Cb))
                def _():
                    density_stage(k - 2 * K - 1)

            # interleave: S_0(k), P_0(k-1), S_1(k-2), P_1(k-3), ...
            for s in range(K):
                @pl.when((k >= 2 * s) & (k - 2 * s < V))
                def _(s=s):
                    stream_stage(s, k - 2 * s)

                @pl.when((k >= 2 * s + 1) & (k - 2 * s - 1 < V))
                def _(s=s):
                    phys_stage(s, k - 2 * s - 1)

            @pl.when(k + 3 < V)
            def _():
                load(k + 3)
            return 0

        # +2 iterations when emitting: P_{K-1}(V-1) must run (its inner
        # boundary rows feed D(Cb)), then D(Cb) itself
        jax.lax.fori_loop(0, V + 2 * K - 2 + (2 if S else 0), body, 0)
        if Cb >= 2:
            store(Cb - 1).wait()
        store(Cb).wait()
        if S:
            if Cb >= 2:
                store_rho(Cb - 1).wait()
            store_rho(Cb).wait()

    scratch = [pltpu.VMEM((_NIN, P, CH, nx), dtype)]
    scratch += [pltpu.VMEM((_NFS, P, CH, nx), dtype) for _ in range(K)]
    scratch += [pltpu.VMEM((_NRHO, C, CH, nx), dtype) for _ in range(K)]
    scratch += [pltpu.VMEM((_NFO, P, CH, nx), dtype) for _ in range(K - 1)]
    scratch += [pltpu.VMEM((_NOUT, P, CH, nx), dtype)]
    if has_ext:
        scratch.append(pltpu.VMEM((NE, n_ext, CH, nx), dtype))
    if S:
        scratch.append(pltpu.VMEM((_NOUT, S, CH, nx), dtype))
        scratch.append(pltpu.VMEM((_NEDGE, SQ, nx), dtype))
        scratch.append(pltpu.VMEM((_NEDGE, SQ, nx), dtype))
    scratch.append(pltpu.SemaphoreType.DMA((_NIN,)))
    if has_ext:
        scratch.append(pltpu.SemaphoreType.DMA((NE,)))
    scratch.append(pltpu.SemaphoreType.DMA((_NOUT,)))
    if S:
        scratch.append(pltpu.SemaphoreType.DMA((_NOUT,)))

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * (
        (6 if EH else 4) if has_ext else 3)

    # In-place update: the store trail runs >= 2K chunks behind the load
    # front (store(c) issues at iteration c + 2K - 1, loads there touch
    # chunk c + 2K + 2), so writing the output over the input buffer never
    # clobbers unread rows; the wrap/ppermute halos are separate buffers
    # materialized before the call. Halves the kernel's HBM footprint —
    # 4.8 GB at 8192^2 2-fluid, which is what lets BASELINE config 5 fit.
    if S:
        out_shape = (jax.ShapeDtypeStruct((P, H, nx), dtype),
                     jax.ShapeDtypeStruct((S, H, nx), dtype))
        out_specs = (pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY))
    else:
        out_shape = jax.ShapeDtypeStruct((P, H, W if BX else nx), dtype)
        out_specs = pl.BlockSpec(memory_space=pl.ANY)
    call = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        # the x-extended input is a fresh concat (different shape from the
        # body-lane output), so there is nothing to alias in place
        input_output_aliases={} if BX else {0: 0},
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=K * flops_per_cell * H * nx,
            bytes_accessed=(2 * P + n_ext + S) * H * nx * 4,
            transcendentals=0,
        ),
    )

    if EH:
        def step(f_loc, top_halo, bot_halo, g_ext, ext_top, ext_bot):
            return call(f_loc, top_halo, bot_halo, g_ext, ext_top, ext_bot)
    elif has_ext:
        def step(f_loc, top_halo, bot_halo, g_ext):
            return call(f_loc, top_halo, bot_halo, g_ext)
    else:
        def step(f_loc, top_halo, bot_halo):
            return call(f_loc, top_halo, bot_halo)

    step.chunk = CH
    step.k_steps = K
    step.emit_src = tuple(emit_src)
    return step


def separable_belt_force(pe, b, CH, nx):
    """``(sum_c w_c c_x psi(x+c), sum_c w_c c_y psi(x+c))`` over the D2Q9
    moving belt, evaluated separably: the belt weights are
    ``outer([1/6, 2/3, 1/6])`` (1/9 axis, 1/36 diagonal). ``pe`` is a
    ``(CH + 2b)``-row window; returns CH-row force components. Replaces 12
    lane-rolls + 16 MACs with 6 rolls + ~10 ops."""
    up = pe[b - 1:b - 1 + CH]
    dn = pe[b + 1:b + 1 + CH]
    ctr = pe[b:b + CH]
    Sy = (2.0 / 3.0) * ctr + (1.0 / 6.0) * (up + dn)
    fx = (1.0 / 6.0) * (_lane_roll(Sy, -1, nx) - _lane_roll(Sy, 1, nx))
    # dy-weighted difference of x-convolved rows (the dy=0 row has weight 0)
    Sxu = ((2.0 / 3.0) * up
           + (1.0 / 6.0) * (_lane_roll(up, -1, nx) + _lane_roll(up, 1, nx)))
    Sxd = ((2.0 / 3.0) * dn
           + (1.0 / 6.0) * (_lane_roll(dn, -1, nx) + _lane_roll(dn, 1, nx)))
    fy = (1.0 / 6.0) * (Sxd - Sxu)
    return fx, fy


def make_mc_halo_step(
    *,
    H: int,
    nx: int,
    cfg: MCKernelConfig,
    dtype=jnp.float32,
    interpret: bool = False,
    chunk: int | None = None,
    k_steps: int | None = None,
    lattice=D2Q9,
    emit_src: tuple = (),
    x_ext: int = 0,
    body_w: int | None = None,
    ext_map: tuple | None = None,
    ext_halos: bool = False,
):
    """Build ``step(f_loc, top_halo, bot_halo [, g_ext]) -> f_loc`` advancing
    one y-shard of the multicomponent engine by ``k_steps`` LB steps.

    ``x_ext``/``body_w``: 2-D-mesh mode — ``nx`` is the extended working
    width and the output is the ``body_w`` body lanes (see
    :func:`_make_halo_kernel`).

    ``ext_map``: layout of the external force planes as ``(fluid, axis)``
    pairs (axis 0 = Gx, 1 = Gy), one per ``g_ext`` plane. ``None`` = the
    dense default ``[Gx_0..Gx_{C-1}, Gy_0..Gy_{C-1}]``. A sparse map
    avoids shipping all-zero planes when only one fluid is forced (the
    config-5 repulsion: 2 planes instead of 4 — ~1 GB/step of HBM at
    8192^2 2-fluid).

    ``f_loc`` is ``[q*C, H, nx]`` (plane ``j*C + i`` = direction j of fluid
    i); ``top_halo``/``bot_halo`` are one CH-row chunk each,
    ``[q*C, CH, nx]`` (the y-neighbors' boundary rows at the
    current time — the local wrap rows when unsharded); ``g_ext`` (iff
    ``cfg.has_ext``) is ``[2*C, H, nx]`` (Gx planes then Gy), applied
    identically at every internal step (callers force K=1 for step-varying
    fields). With ``emit_src`` the step returns ``(f_loc, rho_next)``,
    ``rho_next[len(emit_src), H, nx]`` = the named fluids' post-stream
    densities ONE step ahead (see :func:`_make_halo_kernel`) — unsharded
    callers only (the wrap rows come from the kernel's own halo-chunk
    outputs). The returned function has attributes ``chunk``,
    ``k_steps`` and ``emit_src``.
    """
    q = lattice.q
    reach = int(max(max(abs(c) for c in lattice.cy), 1))
    C = len(cfg.fluids)
    belt = cfg.belt
    if ext_map is None and cfg.has_ext:
        ext_map = tuple((i, 0) for i in range(C)) + \
            tuple((i, 1) for i in range(C))
    n_ext = len(ext_map) if ext_map else 0
    tiling = pick_mc_tiling(H, nx, C, belt, cfg.has_ext, k_steps,
                            q=q, reach=reach, emit=len(emit_src),
                            n_ext=n_ext)
    if chunk is not None or k_steps is not None:
        CH = chunk if chunk is not None else (tiling[0] if tiling else None)
        K = k_steps if k_steps is not None else (tiling[1] if tiling else 1)
    elif tiling is not None:
        CH, K = tiling
    else:
        CH = K = None
    if CH is None or K is None:
        raise ValueError(
            f"no mc tiling for shard {H}x{nx}, C={C}, K={k_steps}")
    cs2 = lattice.cs2
    cxs, cys, ws = lattice.cx, lattice.cy, lattice.w
    zd = np.asarray(cfg.zero_density, dtype)

    # stencils: (weight, cx, cy) — first belt = D2Q9 moving vectors
    # (multi.py:517-529); second belt = the explicit 25-vector set
    # (single_component.py:533-646, via models.multicomponent).
    def _stencil(b):
        if b == 1:
            # ALWAYS the D2Q9 moving vectors, even on a D2Q25 lattice —
            # the reference's interaction force is built from the D2Q9
            # stencil regardless (multi.py:517-529)
            return [(D2Q9.w[j], D2Q9.cx[j], D2Q9.cy[j])
                    for j in range(1, D2Q9.q)]
        from ..models.multicomponent import SECOND_BELT_STENCIL
        return [(w_, cx_, cy_) for w_, (cx_, cy_) in SECOND_BELT_STENCIL]

    stencils = {b: _stencil(b) for b in {it[5] for it in cfg.interactions}}
    b = belt

    def phys(fs, rho, rho_ext, ext):
        """Multicomponent stage-1 physics (see the module docstring for the
        citations): hydro, Shan-Chen forces, porous drag, barycentric
        velocity, porosity feq + Guo + BGK, eating/growth hooks.

        VPU-heavy, so the math is factored: pair-shared momenta/quads
        (Succi-style, cf. ``_moments_feq_collide``), quads shared across
        fluids with equal porosity, and the first-belt Shan-Chen stencil
        evaluated separably."""
        has_forces = (cfg.has_ext or cfg.const_forces or cfg.const_g
                      or cfg.interactions or cfg.porous)

        # hydro (update_hydro_pourous, single_component.cl:214-274),
        # pair-factored momenta on D2Q9, per-direction otherwise
        jx, jy, u, v, good, safe = [], [], [], [], [], []
        for i in range(C):
            f_ = fs[i]
            if lattice is D2Q9:
                d57 = f_[5] - f_[7]
                d68 = f_[6] - f_[8]
                jxi = (f_[1] - f_[3]) + d57 - d68
                jyi = (f_[2] - f_[4]) + d57 + d68
            else:
                jxi = jnp.zeros_like(rho[i])
                jyi = jnp.zeros_like(rho[i])
                for j in range(1, q):
                    if cxs[j]:
                        jxi = jxi + float(cxs[j]) * f_[j]
                    if cys[j]:
                        jyi = jyi + float(cys[j]) * f_[j]
            jx.append(jxi)
            jy.append(jyi)
            g = rho[i] > zd
            sf = jnp.where(g, rho[i], 1.0)
            good.append(g)
            safe.append(sf)
            if has_forces:
                inv = 1.0 / sf
                u.append(jnp.where(g, jxi * inv, 0.0))
                v.append(jnp.where(g, jyi * inv, 0.0))

        # forces: ext fields, constants, gravity, Shan-Chen
        if has_forces:
            Gx = [None] * C
            Gy = [None] * C

            def _acc(G, i, val):
                G[i] = val if G[i] is None else G[i] + val

            if cfg.has_ext:
                for p, (i, ax) in enumerate(ext_map):
                    _acc(Gx if ax == 0 else Gy, i, ext[p])
            for i, fx_, fy_ in cfg.const_forces:
                _acc(Gx, i, jnp.full_like(rho[i], np.asarray(fx_, dtype)))
                _acc(Gy, i, jnp.full_like(rho[i], np.asarray(fy_, dtype)))
            for i, gx_, gy_ in cfg.const_g:
                _acc(Gx, i, np.asarray(gx_, dtype) * rho[i])
                _acc(Gy, i, np.asarray(gy_, dtype) * rho[i])

            for (i1, i2, G_int, spec, params, bl) in cfg.interactions:
                psi1e, psi2e = _psi_pair(spec, rho_ext[i1], rho_ext[i2],
                                         params, cfg.zero_density)
                psi1c = psi1e[b:b + CH]
                psi2c = psi2e[b:b + CH]
                if bl == 1:
                    fx1, fy1 = separable_belt_force(psi2e, b, CH, nx)
                    fx2, fy2 = separable_belt_force(psi1e, b, CH, nx)
                else:
                    fx1 = jnp.zeros_like(psi1c)
                    fy1 = jnp.zeros_like(psi1c)
                    fx2 = jnp.zeros_like(psi1c)
                    fy2 = jnp.zeros_like(psi1c)
                    for wgt, cx_, cy_ in stencils[bl]:
                        # psi(x + c): ext-row slice + lane roll
                        n2 = _lane_roll(psi2e[b + cy_:b + cy_ + CH],
                                        -cx_, nx)
                        n1 = _lane_roll(psi1e[b + cy_:b + cy_ + CH],
                                        -cx_, nx)
                        if cx_:
                            fx1 = fx1 + (wgt * cx_) * n2
                            fx2 = fx2 + (wgt * cx_) * n1
                        if cy_:
                            fy1 = fy1 + (wgt * cy_) * n2
                            fy2 = fy2 + (wgt * cy_) * n1
                # force -> force per density, zero-density guarded
                # (single_component.cl:779-792)
                s1 = jnp.where(good[i1], (-G_int) * psi1c / safe[i1], 0.0)
                s2 = jnp.where(good[i2], (-G_int) * psi2c / safe[i2], 0.0)
                _acc(Gx, i1, s1 * fx1)
                _acc(Gy, i1, s1 * fy1)
                _acc(Gx, i2, s2 * fx2)
                _acc(Gy, i2, s2 * fy2)

            for i in range(C):
                if Gx[i] is None:
                    Gx[i] = jnp.zeros_like(rho[i])
                if Gy[i] is None:
                    Gy[i] = jnp.zeros_like(rho[i])

            if cfg.porous:
                # Darcy + Forchheimer drag, applied last
                # (update_forces_pourous, single_component.cl:276-335)
                for i, fl in enumerate(cfg.fluids):
                    eps, nuf, Kp, Fe = (fl.epsilon, fl.nu_fluid, fl.K,
                                        fl.Fe)
                    gx = Gx[i] * eps - (eps * nuf / Kp) * u[i]
                    gy = Gy[i] * eps - (eps * nuf / Kp) * v[i]
                    vel = jnp.sqrt(u[i] * u[i] + v[i] * v[i])
                    gx = gx - (eps * Fe / np.sqrt(Kp)) * vel * u[i]
                    gy = gy - (eps * Fe / np.sqrt(Kp)) * vel * v[i]
                    Gx[i] = jnp.where(good[i], gx, 0.0)
                    Gy[i] = jnp.where(good[i], gy, 0.0)

        # barycentric velocity (single_component.cl:161-212)
        rho_tot = rho[0]
        if has_forces:
            sx = jx[0] + 0.5 * rho[0] * Gx[0]
            sy = jy[0] + 0.5 * rho[0] * Gy[0]
        else:
            sx, sy = jx[0], jy[0]
        for i in range(1, C):
            rho_tot = rho_tot + rho[i]
            if has_forces:
                sx = sx + jx[i] + 0.5 * rho[i] * Gx[i]
                sy = sy + jy[i] + 0.5 * rho[i] * Gy[i]
            else:
                sx = sx + jx[i]
                sy = sy + jy[i]
        inv_rt = 1.0 / rho_tot
        ub = sx * inv_rt
        vb = sy * inv_rt

        # feq + Guo + BGK, pair-factored; quads shared across fluids
        # with equal porosity (feq: single_component.cl:39-60; Guo:
        # :104-113 / multi.cl:115-126)
        upv = ub + vb
        umv = ub - vb
        usq = ub * ub + vb * vb
        inv_cs2 = 1.0 / cs2
        quad_cache = {}

        def quads(eps):
            """quad_j for all 9 directions at porosity eps."""
            if eps in quad_cache:
                return quad_cache[eps]
            se = usq * (0.5 / (cs2 * eps))
            half_cs4e = 0.5 / (cs2 * cs2 * eps)

            def qpair(a):
                t1 = a * inv_cs2
                r = a * a * half_cs4e - se
                return r + t1, r - t1

            q1, q3 = qpair(ub)
            q2, q4 = qpair(vb)
            q5, q7 = qpair(upv)
            q8, q6 = qpair(umv)
            res = [-se, q1, q2, q3, q4, q5, q6, q7, q8]
            quad_cache[eps] = res
            return res

        out = [[None] * q for _ in range(C)]
        if lattice is not D2Q9:
            # generic per-direction feq + Guo (any q; D2Q25 via
            # multi.py:821-879)
            for i, fl in enumerate(cfg.fluids):
                om, eps = fl.omega, fl.epsilon
                A = 1.0 - om
                pref = 1.0 - 0.5 * om
                e = eps if cfg.porous else 1.0
                if has_forces:
                    Gxi, Gyi = Gx[i], Gy[i]
                    uF = Gxi * ub + Gyi * vb
                    base = rho[i] * pref if cfg.porous else pref
                for j in range(q):
                    cu = float(cxs[j]) * ub + float(cys[j]) * vb
                    quad = (cu / cs2 + cu * cu / (2 * cs2 * cs2 * eps)
                            - usq / (2 * cs2 * eps))
                    val = fs[i][j] * A + (om * ws[j]) * rho[i] * (1.0 + quad)
                    if has_forces:
                        cF = float(cxs[j]) * Gxi + float(cys[j]) * Gyi
                        Fi = (ws[j] * base) * (
                            cF / cs2 + cF * cu / (cs2 * cs2 * e)
                            - uF / (cs2 * e))
                        val = val + Fi
                    out[i][j] = val
            for coll in cfg.collisions:
                if coll[0] == "eating":
                    _, ei, ej, rate = coll
                    growth = np.asarray(rate, dtype) * rho[ei] * rho[ej]
                    for j in range(q):
                        out[ei][j] = out[ei][j] + ws[j] * growth
                        out[ej][j] = out[ej][j] - ws[j] * growth
                else:
                    _, gi, lo, hi, rate = coll
                    grow = jnp.where((rho[gi] > lo) & (rho[gi] < hi),
                                     np.asarray(rate, dtype), 0.0)
                    for j in range(q):
                        out[gi][j] = out[gi][j] + ws[j] * grow
            return out
        for i, fl in enumerate(cfg.fluids):
            om, eps = fl.omega, fl.epsilon
            A = 1.0 - om
            qd = quads(eps)
            # feq_j = w_j rho (1 + quad_j): share om*w*rho per w-class
            wr = {}

            def _wr(wj):
                if wj not in wr:
                    wr[wj] = (om * wj) * rho[i]
                return wr[wj]

            if has_forces:
                # Guo: F_j = w_j pref [rho] (3 cF_j + (9/eps) cF_j cu_j
                #                            - (3/eps) u.F); cu/cF pairs
                # share the product term
                pref = 1.0 - 0.5 * om
                e = eps if cfg.porous else 1.0
                Gxi, Gyi = Gx[i], Gy[i]
                uF3e = (Gxi * ub + Gyi * vb) * (3.0 / e)
                cu = [None, ub, vb, None, None, upv, None, None, umv]
                cF = [None, Gxi, Gyi, None, None, Gxi + Gyi, None,
                      None, Gxi - Gyi]
                base = rho[i] * pref if cfg.porous else pref

                def guo_pair(j):
                    nj = cF[j] * cu[j] * (9.0 / e) - uF3e
                    t = 3.0 * cF[j]
                    return nj + t, nj - t

                g1, g3 = guo_pair(1)
                g2, g4 = guo_pair(2)
                g5, g7 = guo_pair(5)
                g8, g6 = guo_pair(8)
                gs = [-uF3e, g1, g2, g3, g4, g5, g6, g7, g8]
                for j in range(q):
                    base_j = _wr(ws[j])
                    out[i][j] = (fs[i][j] * A + base_j + base_j * qd[j]
                                 + (ws[j] * base) * gs[j])
            else:
                for j in range(q):
                    base_j = _wr(ws[j])
                    out[i][j] = fs[i][j] * A + base_j + base_j * qd[j]

        # additional collisions (eating / growth), on post-stream rho
        for coll in cfg.collisions:
            if coll[0] == "eating":
                _, ei, ej, rate = coll
                growth = np.asarray(rate, dtype) * rho[ei] * rho[ej]
                for j in range(q):
                    out[ei][j] = out[ei][j] + ws[j] * growth
                    out[ej][j] = out[ej][j] - ws[j] * growth
            else:
                _, gi, lo, hi, rate = coll
                grow = jnp.where((rho[gi] > lo) & (rho[gi] < hi),
                                 np.asarray(rate, dtype), 0.0)
                for j in range(q):
                    out[gi][j] = out[gi][j] + ws[j] * grow
        return out

    return _make_halo_kernel(
        H=H, nx=nx, C=C, CH=CH, K=K, belt=belt,
        n_ext=n_ext, phys=phys, dtype=dtype,
        interpret=interpret, lattice=lattice, emit_src=emit_src,
        x_ext=x_ext, body_w=body_w, ext_halos=ext_halos,
        flops_per_cell=(35 * q) * C + 40 * len(cfg.interactions) * 8)
