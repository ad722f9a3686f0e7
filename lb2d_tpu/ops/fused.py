"""Fused Pallas collide-and-stream kernels for the flow family.

The reference spends one full HBM round-trip per sub-kernel per step —
move, copy_buffer, move_bcs, update_hydro, update_feq, collide_particles
(``opencl_dim.py:372-387``), ~6 passes over ``f``. The kernels here perform
the entire step in **one read + one write of f**:

  stream (in-register row/lane shifts) -> Zou-He BCs (masked lane/row
  updates) -> obstacle bounce-back -> moments -> feq -> BGK collide

Two implementations share the same tile math:

* :func:`make_fused_pipe_step` — "blocked": 1-D grid over row tiles,
  auto-pipelined body blocks plus two 8-row halo-chunk DMAs per tile.
  Simple and robust; halo chunks cost extra read bandwidth.
* :func:`make_pipelined_pipe_step` — "pipelined": a single grid step sweeps
  the grid in 8-row chunks through a 4-deep VMEM ring with manual
  double-buffered DMAs in both directions. Every chunk is read exactly once
  (the 1-row stream halo comes from the neighboring chunks already resident
  in the ring), so HBM traffic is the 2-pass minimum.

Lane (x) shifts wrap within the full row; the wrapped-in garbage lands
exactly on the populations the Zou-He boundary rewrites, mirroring the
equivalence argument for the XLA path (see :mod:`lb2d_tpu.ops.stream`).
Scalars (omega, inlet/outlet rho) are compile-time constants baked into the
kernel — fixed per model instance, keeping the VPU inner loop free of SMEM
loads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.lattice import Lattice, D2Q9

__all__ = [
    "make_fused_pipe_step",
    "make_pipelined_pipe_step",
    "make_resident_pipe_step",
    "make_temporal_pipe_step",
    "supports_fused",
    "supports_pipelined",
    "supports_resident",
    "supports_temporal",
]


# ---------------------------------------------------------------------------
# shared tile math
# ---------------------------------------------------------------------------

def _zou_he_tile(st, rowid, laneid, ny, nx, inlet_rho, outlet_rho,
                 incompressible):
    """Apply the full Zou-He pressure BC set (inlet/outlet columns, solid
    walls, 4 corners; ``D2Q9.cl:173-261`` / ``D2Q9i.cl:173-261``) to a list of
    9 streamed tile planes via masked lane/row updates. ``rowid``/``laneid``
    are *global* cell coordinates broadcast over the tile."""
    s = tuple(st)  # pre-BC snapshot (D2Q9.cl:187-195)

    row_int = (rowid >= 1) & (rowid <= ny - 2)
    lane_int = (laneid >= 1) & (laneid <= nx - 2)
    lane0 = laneid == 0
    laneN = laneid == nx - 1
    row0 = rowid == 0
    rowN = rowid == ny - 1

    if incompressible:
        # D2Q9i.cl:194-206
        u_in = -s[0] - s[2] - 2 * s[3] - s[4] - 2 * s[6] - 2 * s[7] + inlet_rho
        in1 = (1.0 / 3.0) * (3 * s[3] + 2 * u_in)
        in5 = (1.0 / 6.0) * (-3 * s[2] + 3 * s[4] + 6 * s[7] + u_in)
        in8 = (1.0 / 6.0) * (3 * s[2] - 3 * s[4] + 6 * s[6] + u_in)
        u_out = s[0] + 2 * s[1] + s[2] + s[4] + 2 * s[5] + 2 * s[8] - outlet_rho
        out3 = (1.0 / 3.0) * (3 * s[1] - 2 * u_out)
        out6 = (1.0 / 6.0) * (-3 * s[2] + 3 * s[4] + 6 * s[8] - u_out)
        out7 = (1.0 / 6.0) * (3 * s[2] - 3 * s[4] + 6 * s[5] - u_out)
    else:
        # D2Q9.cl:198-210
        u_in = -((s[0] + s[2] + 2 * s[3] + s[4] + 2 * s[6] + 2 * s[7]
                  - inlet_rho) / inlet_rho)
        in1 = s[3] + (2.0 / 3.0) * inlet_rho * u_in
        in5 = -0.5 * s[2] + 0.5 * s[4] + s[7] + (1.0 / 6.0) * u_in * inlet_rho
        in8 = 0.5 * s[2] - 0.5 * s[4] + s[6] + (1.0 / 6.0) * u_in * inlet_rho
        u_out = (-1.0 + (s[0] + 2 * s[1] + s[2] + s[4] + 2 * s[5]
                         + 2 * s[8]) / outlet_rho)
        out3 = s[1] - (2.0 / 3.0) * outlet_rho * u_out
        out6 = -0.5 * s[2] + 0.5 * s[4] + s[8] - (1.0 / 6.0) * u_out * outlet_rho
        out7 = 0.5 * s[2] - 0.5 * s[4] + s[5] - (1.0 / 6.0) * u_out * outlet_rho

    m_in = lane0 & row_int
    m_out = laneN & row_int
    st[1] = jnp.where(m_in, in1, st[1])
    st[5] = jnp.where(m_in, in5, st[5])
    st[8] = jnp.where(m_in, in8, st[8])
    st[3] = jnp.where(m_out, out3, st[3])
    st[6] = jnp.where(m_out, out6, st[6])
    st[7] = jnp.where(m_out, out7, st[7])

    # walls (D2Q9.cl:212-223), identical in both variants
    m_n = rowN & lane_int
    m_s = row0 & lane_int
    st[4] = jnp.where(m_n, s[2], st[4])
    st[8] = jnp.where(m_n, 0.5 * (-s[1] + s[3] + 2 * s[6]), st[8])
    st[7] = jnp.where(m_n, 0.5 * (s[1] - s[3] + 2 * s[5]), st[7])
    st[2] = jnp.where(m_s, s[4], st[2])
    st[6] = jnp.where(m_s, 0.5 * (s[1] - s[3] + 2 * s[8]), st[6])
    st[5] = jnp.where(m_s, 0.5 * (-s[1] + s[3] + 2 * s[7]), st[5])

    # corners (D2Q9.cl:228-259)
    bi = row0 & lane0
    ti = rowN & lane0
    bo = row0 & laneN
    to = rowN & laneN
    bi_d = 0.5 * (-s[0] - 2 * s[3] - 2 * s[4] - 2 * s[7] + inlet_rho)
    ti_d = 0.5 * (-s[0] - 2 * s[2] - 2 * s[3] - 2 * s[6] + inlet_rho)
    bo_d = 0.5 * (-s[0] - 2 * s[1] - 2 * s[4] - 2 * s[8] + outlet_rho)
    to_d = 0.5 * (-s[0] - 2 * s[1] - 2 * s[2] - 2 * s[5] + outlet_rho)
    st[1] = jnp.where(bi, s[3], jnp.where(ti, s[3], st[1]))
    st[2] = jnp.where(bi, s[4], jnp.where(bo, s[4], st[2]))
    st[5] = jnp.where(bi, s[7], jnp.where(ti, ti_d, jnp.where(bo, bo_d, st[5])))
    st[6] = jnp.where(bi, bi_d, jnp.where(bo, s[8], jnp.where(to, to_d, st[6])))
    st[8] = jnp.where(bi, bi_d, jnp.where(ti, s[6], jnp.where(to, to_d, st[8])))
    st[4] = jnp.where(ti, s[2], jnp.where(to, s[2], st[4]))
    st[7] = jnp.where(ti, ti_d, jnp.where(bo, bo_d, jnp.where(to, s[5], st[7])))
    st[3] = jnp.where(bo, s[1], jnp.where(to, s[1], st[3]))
    return st


def _moments_feq_collide(st, mask, omega, lattice, incompressible,
                         zero_vel_in_obstacle):
    """Bounce-back (optional) + moments + feq + BGK on streamed tile planes.
    Returns the 9 post-collision planes.

    The D2Q9 fast path shares arithmetic across opposite-direction pairs
    (Succi-style factoring, cf. ``python_dim.py:151-180``): each axis
    ``a in {u, v, u+v, u-v}`` contributes ``quad_+- = 4.5 a^2 - 1.5|u|^2
    +- 3a`` to a +/- direction pair, roughly halving the VPU op count of the
    naive per-direction form.
    """
    q = lattice.q
    cs2 = lattice.cs2

    if mask is not None:
        # bounce-back reads the post-BC snapshot (D2Q9.cl:398-433)
        s2 = tuple(st)
        for j in range(q):
            st[j] = jnp.where(mask, s2[lattice.opp[j]], st[j])

    if lattice is not D2Q9:
        return _moments_feq_collide_generic(st, omega, lattice,
                                            incompressible)

    f0, f1, f2, f3, f4, f5, f6, f7, f8 = st
    rho = ((f1 + f3) + (f2 + f4)) + ((f5 + f7) + (f6 + f8)) + f0
    d13 = f1 - f3
    d24 = f2 - f4
    d57 = f5 - f7
    d68 = f6 - f8
    jx = d13 + d57 - d68
    jy = d24 + d57 + d68
    if incompressible:
        u, v = jx, jy
    else:
        inv = 1.0 / rho
        u, v = jx * inv, jy * inv
    if mask is not None and zero_vel_in_obstacle:
        # D2Q9i driver zeroes velocity inside the mask (opencl_dim_D2Q9i.py:494-502)
        u = jnp.where(mask, 0.0, u)
        v = jnp.where(mask, 0.0, v)

    s = (u * u + v * v) * (0.5 / cs2)      # |u|^2 / (2 cs^2)
    inv_cs2 = 1.0 / cs2
    half_cs4 = 0.5 / (cs2 * cs2)

    def quad_pair(a):
        t1 = a * inv_cs2
        r = a * a * half_cs4 - s
        return r + t1, r - t1

    q1, q3 = quad_pair(u)
    q2, q4 = quad_pair(v)
    q5, q7 = quad_pair(u + v)
    q8, q6 = quad_pair(u - v)
    q0 = -s

    om = omega
    A = 1.0 - om
    if incompressible:
        # feq_j = w_j (rho + quad_j) (D2Q9i.cl:55-60)
        def relax(f, wj, qj):
            return f * A + (om * wj) * (rho + qj)
    else:
        # feq_j = w_j rho (1 + quad_j) (D2Q9.cl:55-60)
        wr = {}

        def relax(f, wj, qj):
            key = wj
            if key not in wr:
                wr[key] = (om * wj) * rho
            base = wr[key]
            return f * A + base + base * qj

    w0, w1, w2 = 4.0 / 9.0, 1.0 / 9.0, 1.0 / 36.0
    return [
        relax(f0, w0, q0),
        relax(f1, w1, q1), relax(f2, w1, q2),
        relax(f3, w1, q3), relax(f4, w1, q4),
        relax(f5, w2, q5), relax(f6, w2, q6),
        relax(f7, w2, q7), relax(f8, w2, q8),
    ]


def _moments_feq_collide_generic(st, omega, lattice, incompressible):
    """Per-direction fallback for non-D2Q9 lattices."""
    q = lattice.q
    cxs, cys, ws = lattice.cx, lattice.cy, lattice.w
    cs2 = lattice.cs2
    rho = st[0]
    for j in range(1, q):
        rho = rho + st[j]
    jx = jnp.zeros_like(rho)
    jy = jnp.zeros_like(rho)
    for j in range(1, q):
        if cxs[j]:
            jx = jx + cxs[j] * st[j]
        if cys[j]:
            jy = jy + cys[j] * st[j]
    if incompressible:
        u, v = jx, jy
    else:
        inv = 1.0 / rho
        u, v = jx * inv, jy * inv
    usq = u * u + v * v
    out = []
    for j in range(q):
        if cxs[j] or cys[j]:
            cu = cxs[j] * u + cys[j] * v
            quad = cu / cs2 + (cu * cu) / (2.0 * cs2 * cs2) - usq / (2.0 * cs2)
        else:
            quad = -usq / (2.0 * cs2)
        feq_j = ws[j] * (rho + quad) if incompressible else ws[j] * rho * (1.0 + quad)
        out.append(st[j] * (1.0 - omega) + omega * feq_j)
    return out


def _diffusion_collide(st, omega, u_lb, v_lb, lb_G, lattice):
    """Linear-feq BGK for the advection-diffusion family with an imposed
    constant velocity and optional Fisher source (``D2Q9_diffusion.cl:1-38,
    95-124``): ``feq_j = w_j rho (1 + c.u/cs2)``,
    ``f' = f(1-w) + w feq + w_j G rho (1 - rho)``."""
    q = lattice.q
    cs2 = lattice.cs2
    rho = st[0]
    for j in range(1, q):
        rho = rho + st[j]
    A = 1.0 - omega
    react = lb_G * rho * (1.0 - rho) if lb_G else None
    out = []
    for j in range(q):
        cu = lattice.cx[j] * u_lb + lattice.cy[j] * v_lb
        coef = lattice.w[j] * (1.0 + cu / cs2)
        f_new = st[j] * A + (omega * coef) * rho
        if react is not None:
            f_new = f_new + lattice.w[j] * react
        out.append(f_new)
    return out


def _box_muller_pair(b1, b2):
    """Two uint32 bit fields -> TWO independent standard normals (top 24
    bits each; offset keeps u1 in (0, 1] so log never sees 0). The cos and
    sin branches share one log/sqrt — callers with >= 2 normal fields per
    cell (the multifield Expansion) should consume both: it halves the
    PRNG draws and the transcendental count. The 24-bit values are bitcast
    to int32 before the float conversion (Mosaic has no uint32->float32
    cast)."""
    t1 = jax.lax.bitcast_convert_type(b1 >> 8, jnp.int32)
    t2 = jax.lax.bitcast_convert_type(b2 >> 8, jnp.int32)
    u1 = t1.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))
    u2 = t2.astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = (2.0 * np.pi) * u2
    return r * jnp.cos(ang), r * jnp.sin(ang)


def _box_muller(b1, b2):
    """One standard normal (the cos branch of :func:`_box_muller_pair`)."""
    return _box_muller_pair(b1, b2)[0]


def _normal_from_bits(shape):
    """Standard normals via Box-Muller on the on-core TPU PRNG.

    Must be preceded by ``pltpu.prng_seed``.
    """
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return _box_muller(b1, b2)


def _normal_pair_from_bits(shape):
    """Two independent normal fields for the cost of one Box-Muller
    (see :func:`_box_muller_pair`). Must be preceded by ``prng_seed``."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return _box_muller_pair(b1, b2)


def _hash_u32(x):
    """PCG-style avalanche hash on uint32 arrays (interpret-mode PRNG;
    ``pltpu.prng_random_bits`` has no CPU lowering)."""
    x = (x ^ (x >> 16)) * np.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * np.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _normal_from_hash(seed_i32, shape):
    """Interpret-mode stand-in for :func:`_normal_from_bits`: counter-based
    hash of (seed, cell index) in plain jnp ops. Different realization from
    the TPU hardware PRNG, same distribution."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    cell = rows * np.uint32(shape[1]) + cols
    s = jax.lax.bitcast_convert_type(seed_i32, jnp.uint32)
    b1 = _hash_u32(cell ^ s)
    b2 = _hash_u32(cell ^ s ^ np.uint32(0x9E3779B9))
    return _box_muller(b1, b2)


def _velocity_inlet_tile(st, laneid, nx, u_w):
    """Zou-He velocity inlet (lane 0) + zero-gradient open outlet
    (lane nx-1), periodic top/bottom — the tile form of
    :func:`lb2d_tpu.ops.boundary.zou_he_velocity_inlet_open_outlet`
    (``D2Q9.cl:291-296`` inlet formulas; wrap-compatible full-column
    application per DIVERGENCES.md #20-21)."""
    lane0 = laneid == 0
    laneN = laneid == nx - 1
    c = [p[:, 0:1] for p in st]  # inlet column, [rows, 1] broadcast
    rho_w = (1.0 / (1.0 - u_w)) * (c[0] + c[2] + c[4]
                                   + 2.0 * (c[3] + c[6] + c[7]))
    in1 = c[3] + (2.0 / 3.0) * rho_w * u_w
    in5 = c[7] - 0.5 * (c[2] - c[4]) + (1.0 / 6.0) * rho_w * u_w
    in8 = c[6] + 0.5 * (c[2] - c[4]) + (1.0 / 6.0) * rho_w * u_w
    st[1] = jnp.where(lane0, in1, st[1])
    st[5] = jnp.where(lane0, in5, st[5])
    st[8] = jnp.where(lane0, in8, st[8])
    # open outlet: domain-entering populations copy the upstream column
    for j in (3, 6, 7):
        st[j] = jnp.where(laneN, _lane_roll(st[j], 1, nx), st[j])
    return st


def _lane_roll(arr, shift, nx):
    if shift:
        return pltpu.roll(arr, shift % nx, axis=1)
    return arr


def _zou_he_inout_narrow(st, rowid, laneid, ny, nx, inlet_rho, outlet_rho,
                         incompressible):
    """Cost-optimized Zou-He inlet/outlet columns for the pipelined kernel.

    The formulas only matter on lanes 0 and nx-1, so they are evaluated on
    128-lane slices (one lane-tile) and broadcast back through the masked
    select as [rows, 1] columns — 1/32nd of the full-width arithmetic.
    Identical formulas to :func:`_zou_he_tile`; only the evaluation domain
    shrinks. Walls/corners are handled separately by
    :func:`_walls_corners_tile` on the edge row chunks.
    """
    # lane tiles holding the inlet (lane 0) and outlet (lane nx-1) columns;
    # with padded arrays the outlet lane can sit inside the array, so slice
    # the 128-lane tile that contains it.
    pad_nx = st[0].shape[1]
    L = min(128, pad_nx)
    t0 = ((nx - 1) // L) * L
    col = (nx - 1) - t0
    sL = [p[:, :L] for p in st]
    sR = [p[:, t0:t0 + L] for p in st]

    if incompressible:
        u_in = (-sL[0] - sL[2] - 2 * sL[3] - sL[4] - 2 * sL[6] - 2 * sL[7]
                + inlet_rho)
        in1 = (1.0 / 3.0) * (3 * sL[3] + 2 * u_in)
        in5 = (1.0 / 6.0) * (-3 * sL[2] + 3 * sL[4] + 6 * sL[7] + u_in)
        in8 = (1.0 / 6.0) * (3 * sL[2] - 3 * sL[4] + 6 * sL[6] + u_in)
        u_out = (sR[0] + 2 * sR[1] + sR[2] + sR[4] + 2 * sR[5] + 2 * sR[8]
                 - outlet_rho)
        out3 = (1.0 / 3.0) * (3 * sR[1] - 2 * u_out)
        out6 = (1.0 / 6.0) * (-3 * sR[2] + 3 * sR[4] + 6 * sR[8] - u_out)
        out7 = (1.0 / 6.0) * (3 * sR[2] - 3 * sR[4] + 6 * sR[5] - u_out)
    else:
        u_in = -((sL[0] + sL[2] + 2 * sL[3] + sL[4] + 2 * sL[6] + 2 * sL[7]
                  - inlet_rho) / inlet_rho)
        in1 = sL[3] + (2.0 / 3.0) * inlet_rho * u_in
        in5 = -0.5 * sL[2] + 0.5 * sL[4] + sL[7] + (1.0 / 6.0) * u_in * inlet_rho
        in8 = 0.5 * sL[2] - 0.5 * sL[4] + sL[6] + (1.0 / 6.0) * u_in * inlet_rho
        u_out = (-1.0 + (sR[0] + 2 * sR[1] + sR[2] + sR[4] + 2 * sR[5]
                         + 2 * sR[8]) / outlet_rho)
        out3 = sR[1] - (2.0 / 3.0) * outlet_rho * u_out
        out6 = -0.5 * sR[2] + 0.5 * sR[4] + sR[8] - (1.0 / 6.0) * u_out * outlet_rho
        out7 = 0.5 * sR[2] - 0.5 * sR[4] + sR[5] - (1.0 / 6.0) * u_out * outlet_rho

    # Full-size masked selects with a [rows, 1] column broadcast: the
    # boundary value is constant along lanes, so only its lane-0 (resp.
    # lane nx-1) column is selected. (Narrow-select + concat splice and
    # dynamic_update_slice variants crash / are unimplemented in Mosaic.)
    row_int = (rowid >= 1) & (rowid <= ny - 2)
    m_in = (laneid == 0) & row_int
    m_out = (laneid == nx - 1) & row_int
    st[1] = jnp.where(m_in, in1[:, :1], st[1])
    st[5] = jnp.where(m_in, in5[:, :1], st[5])
    st[8] = jnp.where(m_in, in8[:, :1], st[8])
    st[3] = jnp.where(m_out, out3[:, col:col + 1], st[3])
    st[6] = jnp.where(m_out, out6[:, col:col + 1], st[6])
    st[7] = jnp.where(m_out, out7[:, col:col + 1], st[7])
    return st


def _zou_he_inout_ext(st, rowid, laneid, ny, nx, body_off, W, inlet_rho,
                      outlet_rho, incompressible):
    """Zou-He inlet/outlet columns for x-halo-extended tiles (2-D-mesh
    kernel path): the tile's body lanes sit at ``[body_off, body_off+W)``;
    ``laneid`` is the GLOBAL lane coordinate. The inlet formulas are
    evaluated on the first body lane-tile (whose first column is global
    lane 0 on the shard that owns it; masks are all-false elsewhere), the
    outlet on the last body lane-tile. Identical formulas to
    :func:`_zou_he_tile`."""
    L = 128
    assert W >= L
    sL = [p[:, body_off:body_off + L] for p in st]
    sR = [p[:, body_off + W - L:body_off + W] for p in st]
    col = L - 1

    if incompressible:
        u_in = (-sL[0] - sL[2] - 2 * sL[3] - sL[4] - 2 * sL[6] - 2 * sL[7]
                + inlet_rho)
        in1 = (1.0 / 3.0) * (3 * sL[3] + 2 * u_in)
        in5 = (1.0 / 6.0) * (-3 * sL[2] + 3 * sL[4] + 6 * sL[7] + u_in)
        in8 = (1.0 / 6.0) * (3 * sL[2] - 3 * sL[4] + 6 * sL[6] + u_in)
        u_out = (sR[0] + 2 * sR[1] + sR[2] + sR[4] + 2 * sR[5] + 2 * sR[8]
                 - outlet_rho)
        out3 = (1.0 / 3.0) * (3 * sR[1] - 2 * u_out)
        out6 = (1.0 / 6.0) * (-3 * sR[2] + 3 * sR[4] + 6 * sR[8] - u_out)
        out7 = (1.0 / 6.0) * (3 * sR[2] - 3 * sR[4] + 6 * sR[5] - u_out)
    else:
        u_in = -((sL[0] + sL[2] + 2 * sL[3] + sL[4] + 2 * sL[6] + 2 * sL[7]
                  - inlet_rho) / inlet_rho)
        in1 = sL[3] + (2.0 / 3.0) * inlet_rho * u_in
        in5 = -0.5 * sL[2] + 0.5 * sL[4] + sL[7] + (1.0 / 6.0) * u_in * inlet_rho
        in8 = 0.5 * sL[2] - 0.5 * sL[4] + sL[6] + (1.0 / 6.0) * u_in * inlet_rho
        u_out = (-1.0 + (sR[0] + 2 * sR[1] + sR[2] + sR[4] + 2 * sR[5]
                         + 2 * sR[8]) / outlet_rho)
        out3 = sR[1] - (2.0 / 3.0) * outlet_rho * u_out
        out6 = -0.5 * sR[2] + 0.5 * sR[4] + sR[8] - (1.0 / 6.0) * u_out * outlet_rho
        out7 = 0.5 * sR[2] - 0.5 * sR[4] + sR[5] - (1.0 / 6.0) * u_out * outlet_rho

    row_int = (rowid >= 1) & (rowid <= ny - 2)
    m_in = (laneid == 0) & row_int
    m_out = (laneid == nx - 1) & row_int
    st[1] = jnp.where(m_in, in1[:, :1], st[1])
    st[5] = jnp.where(m_in, in5[:, :1], st[5])
    st[8] = jnp.where(m_in, in8[:, :1], st[8])
    st[3] = jnp.where(m_out, out3[:, col:col + 1], st[3])
    st[6] = jnp.where(m_out, out6[:, col:col + 1], st[6])
    st[7] = jnp.where(m_out, out7[:, col:col + 1], st[7])
    return st


def _walls_corners_tile(st, rowid, laneid, ny, nx, inlet_rho, outlet_rho):
    """Solid walls + 4 corners (``D2Q9.cl:212-259``) as masked selects on a
    (small) tile; the pipelined kernel calls this only on the edge row
    slices under ``pl.when``."""
    st = list(st)
    s = tuple(st)
    lane_int = (laneid >= 1) & (laneid <= nx - 2)
    lane0 = laneid == 0
    laneN = laneid == nx - 1
    row0 = rowid == 0
    rowN = rowid == ny - 1
    m_n = rowN & lane_int
    m_s = row0 & lane_int
    st[4] = jnp.where(m_n, s[2], st[4])
    st[8] = jnp.where(m_n, 0.5 * (-s[1] + s[3] + 2 * s[6]), st[8])
    st[7] = jnp.where(m_n, 0.5 * (s[1] - s[3] + 2 * s[5]), st[7])
    st[2] = jnp.where(m_s, s[4], st[2])
    st[6] = jnp.where(m_s, 0.5 * (s[1] - s[3] + 2 * s[8]), st[6])
    st[5] = jnp.where(m_s, 0.5 * (-s[1] + s[3] + 2 * s[7]), st[5])

    bi = row0 & lane0
    ti = rowN & lane0
    bo = row0 & laneN
    to = rowN & laneN
    bi_d = 0.5 * (-s[0] - 2 * s[3] - 2 * s[4] - 2 * s[7] + inlet_rho)
    ti_d = 0.5 * (-s[0] - 2 * s[2] - 2 * s[3] - 2 * s[6] + inlet_rho)
    bo_d = 0.5 * (-s[0] - 2 * s[1] - 2 * s[4] - 2 * s[8] + outlet_rho)
    to_d = 0.5 * (-s[0] - 2 * s[1] - 2 * s[2] - 2 * s[5] + outlet_rho)
    st[1] = jnp.where(bi | ti, s[3], st[1])
    st[2] = jnp.where(bi | bo, s[4], st[2])
    st[5] = jnp.where(bi, s[7], jnp.where(ti, ti_d, jnp.where(bo, bo_d, st[5])))
    st[6] = jnp.where(bi, bi_d, jnp.where(bo, s[8], jnp.where(to, to_d, st[6])))
    st[8] = jnp.where(bi, bi_d, jnp.where(ti, s[6], jnp.where(to, to_d, st[8])))
    st[4] = jnp.where(ti | to, s[2], st[4])
    st[7] = jnp.where(ti, ti_d, jnp.where(bo, bo_d, jnp.where(to, s[5], st[7])))
    st[3] = jnp.where(bo | to, s[1], st[3])
    return st


# ---------------------------------------------------------------------------
# blocked kernel
# ---------------------------------------------------------------------------

def supports_fused(ny: int, nx: int) -> bool:
    return _pick_tile(ny, nx) is not None


def _pick_tile(ny: int, nx: int) -> int | None:
    """Row-tile height T for the blocked kernel: sublane blocks must be
    8-divisible or equal to the full dim; HBM DMA row-slices 8-aligned
    (ny >= 8). VMEM: double-buffered body+out blocks plus temporaries."""
    if ny < 8 or nx % 128 != 0:
        # HBM DMA slices must be (8,128)-tile aligned; unaligned grids use
        # the XLA path.
        return None
    vmem_budget = 10 * 1024 * 1024

    def cost(t):
        return (4 * 9 + 12) * t * nx * 4 + 9 * 16 * nx * 4

    if cost(ny) < vmem_budget:
        return ny  # single tile, any ny >= 8
    for t in (32, 16, 8):
        if ny % t == 0 and cost(t) < vmem_budget:
            return t
    return None


def make_fused_pipe_step(
    *,
    ny: int,
    nx: int,
    omega: float,
    inlet_rho: float,
    outlet_rho: float,
    equilibrium: str = "compressible",
    has_obstacle: bool = False,
    lattice: Lattice = D2Q9,
    dtype=jnp.float32,
    interpret: bool = False,
):
    """Build ``step(f [, mask]) -> f`` as a blocked fused Pallas kernel.

    Exactly reproduces the XLA-path step of
    :class:`lb2d_tpu.models.pipe_flow.PipeFlow` (stream -> pressure BCs ->
    [bounce-back] -> hydro -> feq -> collide).
    """
    T = _pick_tile(ny, nx)
    if T is None:
        raise ValueError(f"no fused tiling for grid {ny}x{nx}")
    n_tiles = ny // T
    q = lattice.q
    incompressible = equilibrium == "incompressible"
    w_inlet = np.asarray(inlet_rho, dtype)
    w_outlet = np.asarray(outlet_rho, dtype)
    w_omega = np.asarray(omega, dtype)

    def kernel(*refs):
        if has_obstacle:
            f_hbm, body, mask_blk, out = refs[:4]
            scratch, sem = refs[4:]
        else:
            f_hbm, body, out = refs[:3]
            scratch, sem = refs[3:]

        i = pl.program_id(0)
        y0 = i * T
        # HBM row slices must be 8-aligned chunks (Mosaic (8,128) tiling):
        # fetch the 8-row chunks containing the halo rows. At domain edges the
        # clamped chunk holds wrong (non-wrapped) rows — harmless, since the
        # populations streamed in from outside the domain are exactly the ones
        # the Zou-He BC rewrites.
        top_start = pl.multiple_of(jnp.maximum(y0 - 8, 0), 8)
        bot_start = pl.multiple_of(
            jnp.minimum(y0 + T, ((ny - 8) // 8) * 8), 8)

        ctop = pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(top_start, 8), :], scratch.at[:, 0:8, :], sem.at[0])
        cbot = pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(bot_start, 8), :], scratch.at[:, 8:16, :], sem.at[1])
        ctop.start()
        cbot.start()
        ctop.wait()
        cbot.wait()

        st = []
        for j in range(q):
            cxj, cyj = lattice.cx[j], lattice.cy[j]
            if cyj == 1:
                rows = jnp.concatenate(
                    [scratch[j, 7:8, :], body[j, 0:T - 1, :]], axis=0)
            elif cyj == -1:
                rows = jnp.concatenate(
                    [body[j, 1:T, :], scratch[j, 8:9, :]], axis=0)
            else:
                rows = body[j, :, :]
            st.append(_lane_roll(rows, cxj, nx))

        rowid = jax.lax.broadcasted_iota(jnp.int32, (T, nx), 0) + y0
        laneid = jax.lax.broadcasted_iota(jnp.int32, (T, nx), 1)
        st = _zou_he_tile(st, rowid, laneid, ny, nx, w_inlet, w_outlet,
                          incompressible)
        mask = (mask_blk[:, :] != 0) if has_obstacle else None
        res = _moments_feq_collide(st, mask, w_omega, lattice, incompressible,
                                   zero_vel_in_obstacle=incompressible)
        for j in range(q):
            out[j, :, :] = res[j]

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # halo source (HBM)
        pl.BlockSpec((q, T, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    ]
    if has_obstacle:
        in_specs.append(
            pl.BlockSpec((T, nx), lambda i: (i, 0), memory_space=pltpu.VMEM))

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((q, ny, nx), dtype),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((q, T, nx), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((q, 16, nx), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    if has_obstacle:
        def step(f, mask):
            return call(f, f, mask)
    else:
        def step(f):
            return call(f, f)

    return step


# ---------------------------------------------------------------------------
# pipelined single-sweep kernel
# ---------------------------------------------------------------------------

_NSLOTS = 4      # input ring depth
_NOUT = 2        # output ring depth
_VMEM_BUDGET = 96 * 1024 * 1024  # v5e VMEM is 128 MiB; leave headroom


def _pick_chunk(ny: int, nx: int) -> int | None:
    """Chunk height for the pipelined sweep: multiples of the 8-row HBM
    tiling, big enough to amortize per-chunk DMA/loop overhead, small enough
    that the VMEM rings + temporaries fit."""
    if nx % 128 != 0:
        return None
    for ch in (64, 32, 16, 8):
        if ny % ch or ny // ch < _NSLOTS:
            continue
        ring = (_NSLOTS + _NOUT) * 9 * ch * nx * 4 + 16 * ch * nx * 4
        if ring < _VMEM_BUDGET:
            return ch
    return None


def supports_pipelined(ny: int, nx: int) -> bool:
    """ny must split into >= 4 aligned 8-row chunks; VMEM rings must fit."""
    return _pick_chunk(ny, nx) is not None


def make_pipelined_pipe_step(
    *,
    ny: int,
    nx: int,
    omega: float,
    inlet_rho: float,
    outlet_rho: float,
    equilibrium: str = "compressible",
    has_obstacle: bool = False,
    lattice: Lattice = D2Q9,
    dtype=jnp.float32,
    interpret: bool = False,
    chunk: int | None = None,
    nslots: int = _NSLOTS,
    nout: int = _NOUT,
):
    """Build ``step(f [, mask]) -> f`` as a single-sweep pipelined kernel.

    One grid step walks the grid in 8-row chunks through a 4-slot VMEM ring:
    chunk ``c``'s compute uses the last row of chunk ``c-1`` and first row of
    chunk ``c+1`` as stream halos — both already resident — so every chunk is
    DMA'd from HBM exactly once and written exactly once (the 2-pass minimum).
    Input DMAs run 2 chunks ahead; output DMAs drain one chunk behind.
    """
    _CH = chunk if chunk is not None else _pick_chunk(ny, nx)
    if _CH is None:
        raise ValueError(f"no pipelined tiling for grid {ny}x{nx}")
    _NS, _NO = nslots, nout
    C = ny // _CH
    assert C >= _NS, (C, _NS)
    q = lattice.q
    incompressible = equilibrium == "incompressible"
    w_inlet = np.asarray(inlet_rho, dtype)
    w_outlet = np.asarray(outlet_rho, dtype)
    w_omega = np.asarray(omega, dtype)

    def kernel(*refs):
        if has_obstacle:
            f_hbm, mask_hbm, out_hbm = refs[:3]
            (in_ring, out_ring, mask_ring, sem_in, sem_out, sem_mask) = refs[3:]
        else:
            f_hbm, out_hbm = refs[:2]
            in_ring, out_ring, sem_in, sem_out = refs[2:]

        def load(c):
            slot = c % _NS
            return pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(pl.multiple_of(c * _CH, _CH), _CH), :],
                in_ring.at[slot], sem_in.at[slot])

        def store(c):
            slot = c % _NO
            return pltpu.make_async_copy(
                out_ring.at[slot],
                out_hbm.at[:, pl.ds(pl.multiple_of(c * _CH, _CH), _CH), :],
                sem_out.at[slot])

        def load_mask(c):
            slot = c % 2
            return pltpu.make_async_copy(
                mask_hbm.at[pl.ds(pl.multiple_of(c * _CH, _CH), _CH), :],
                mask_ring.at[slot], sem_mask.at[slot])

        # prologue: fill the ring (up to _NS - 2 loads in flight)
        for k in range(min(_NS - 2, C)):
            load(k).start()
        if has_obstacle:
            load_mask(0).start()

        laneid = jax.lax.broadcasted_iota(jnp.int32, (_CH, nx), 1)
        rowid0 = jax.lax.broadcasted_iota(jnp.int32, (_CH, nx), 0)

        def body(c, _):
            # arrivals: chunk 0 at c==0, then chunk c+1 (needed as bottom halo)
            @pl.when(c == 0)
            def _():
                load(0).wait()

            @pl.when(c + 1 < C)
            def _():
                load(c + 1).wait()

            if has_obstacle:
                @pl.when(c + 1 < C)
                def _():
                    load_mask(c + 1).start()
                load_mask(c).wait()
                mask = mask_ring[c % 2] != 0
            else:
                mask = None

            prev = (c - 1) % _NS
            cur = c % _NS
            nxt = (c + 1) % _NS

            st = []
            for j in range(q):
                cxj, cyj = lattice.cx[j], lattice.cy[j]
                if cyj == 1:
                    rows = jnp.concatenate(
                        [in_ring[prev, j, _CH - 1:_CH, :],
                         in_ring[cur, j, 0:_CH - 1, :]], axis=0)
                elif cyj == -1:
                    rows = jnp.concatenate(
                        [in_ring[cur, j, 1:_CH, :],
                         in_ring[nxt, j, 0:1, :]], axis=0)
                else:
                    rows = in_ring[cur, j, :, :]
                st.append(_lane_roll(rows, cxj, nx))

            rowid = rowid0 + c * _CH
            st = _zou_he_inout_narrow(st, rowid, laneid, ny, nx, w_inlet,
                                      w_outlet, incompressible)
            # Walls + corners only touch global rows 0 / ny-1; their masks are
            # all-false on interior chunks but the selects still run — cheap
            # relative to the narrow inlet/outlet savings, and conditional
            # variants (lax.cond / pl.when row-slice recompute) either explode
            # Mosaic compile time or crash the compiler on this backend.
            st = _walls_corners_tile(st, rowid, laneid, ny, nx, w_inlet,
                                     w_outlet)
            res = _moments_feq_collide(
                st, mask, w_omega, lattice, incompressible,
                zero_vel_in_obstacle=incompressible)

            # output slot reuse: wait for the store issued 2 chunks ago
            @pl.when(c >= _NO)
            def _():
                store(c - _NO).wait()

            oslot = c % _NO
            for j in range(q):
                out_ring[oslot, j, :, :] = res[j]
            store(c).start()

            # prefetch _NS-2 ahead (that slot held chunk c-2, now dead)
            @pl.when(c + _NS - 2 < C)
            def _():
                load(c + _NS - 2).start()
            return 0

        jax.lax.fori_loop(0, C, body, 0)
        # drain the last stores
        store(C - 2).wait()
        store(C - 1).wait()

    scratch = [
        pltpu.VMEM((_NS, q, _CH, nx), dtype),
        pltpu.VMEM((_NO, q, _CH, nx), dtype),
    ]
    if has_obstacle:
        scratch.append(pltpu.VMEM((2, _CH, nx), jnp.int32))
    scratch.append(pltpu.SemaphoreType.DMA((_NS,)))
    scratch.append(pltpu.SemaphoreType.DMA((_NO,)))
    if has_obstacle:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

    n_in = 2 if has_obstacle else 1
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((q, ny, nx), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=220 * ny * nx,
            bytes_accessed=2 * q * ny * nx * 4,
            transcendentals=0,
        ),
    )

    if has_obstacle:
        def step(f, mask):
            return call(f, mask)
    else:
        def step(f):
            return call(f)

    return step


# ---------------------------------------------------------------------------
# temporal-blocked kernel: TWO LB steps per HBM sweep
# ---------------------------------------------------------------------------

_T2_CH = 16      # chunk height for the K-step kernel
_T2_NS = 5       # step-0 input ring depth
_T2_NM = 4       # intermediate ring depth (per internal step)
_T2_NO = 2       # output ring depth


def supports_temporal(ny: int, nx: int, k_steps: int = 2) -> bool:
    """K-step temporal blocking needs enough aligned chunks, 128-lane rows,
    and a VMEM ring that fits (4096-wide K=8 measures 82.6MB against the
    100MB compiler budget; wider grids must drop K)."""
    if not (nx % 128 == 0 and ny % _T2_CH == 0
            and ny // _T2_CH >= max(_T2_NS, 3 + k_steps)):
        return False
    slots = _T2_NS + (k_steps - 1) * _T2_NM + _T2_NO
    ring_bytes = slots * 9 * _T2_CH * nx * 4
    return ring_bytes <= 88 * 1024 * 1024


def make_temporal_pipe_step(
    *,
    ny: int,
    nx: int,
    omega: float,
    inlet_rho: float = 1.0,
    outlet_rho: float = 1.0,
    equilibrium: str = "compressible",
    has_obstacle: bool = False,
    lattice: Lattice = D2Q9,
    dtype=jnp.float32,
    interpret: bool = False,
    k_steps: int = 2,
    physics: str = "flow",
    u_lb: float = 0.0,
    v_lb: float = 0.0,
    lb_G: float = 0.0,
    lb_Dg: float = 0.0,
    ny_phys: int | None = None,
    nx_phys: int | None = None,
):
    """Build ``stepK(f) -> f`` advancing ``k_steps`` LB steps per HBM sweep.

    Classic temporal blocking: the sweep keeps ``k_steps - 1`` extra VMEM
    rings of intermediate-step chunks; the step-(s+1) chunk ``c`` is computed
    from step-s chunks ``c-1, c, c+1``. Input chunks are read exactly once,
    so HBM traffic per *LB step* is ``2 / k_steps`` passes — below the
    single-step minimum — trading (otherwise idle) VPU work. The loop is
    skewed: iteration ``k`` runs stage ``s`` on chunk ``k - s``, so each
    stage is instantiated exactly once (Mosaic compile time stays sane).

    Each internal step applies the full stream -> Zou-He -> [bounce-back]
    -> moments -> feq -> collide pipeline, so ``stepK == step^k`` of the XLA
    oracle to fp32 roundoff. With ``has_obstacle`` the (constant) mask is
    streamed once per sweep through its own ring, deep enough that every
    internal stage finds its chunk resident.
    """
    CH = _T2_CH
    K = int(k_steps)
    assert K >= 2
    if not supports_temporal(ny, nx, K):
        raise ValueError(f"no temporal tiling for grid {ny}x{nx}")
    # With padded arrays the BC masks key off the *physical* dims: the walls
    # rewrite exactly the populations through which dead-lane/dead-row
    # garbage could enter the physical domain (flow physics only; periodic
    # families cannot be padded).
    ny_p = ny_phys if ny_phys is not None else ny
    nx_p = nx_phys if nx_phys is not None else nx
    assert physics == "flow" or (ny_p == ny and nx_p == nx)
    assert physics in ("flow", "diffusion", "noisy_fisher", "velocity_inlet")
    C = ny // CH
    q = lattice.q
    incompressible = equilibrium == "incompressible"
    diffusion = physics in ("diffusion", "noisy_fisher")
    noisy = physics == "noisy_fisher"
    vel_inlet = physics == "velocity_inlet"
    w_inlet = np.asarray(inlet_rho, dtype)
    w_outlet = np.asarray(outlet_rho, dtype)
    w_omega = np.asarray(omega, dtype)
    w_ulb = np.asarray(u_lb, dtype)
    w_vlb = np.asarray(v_lb, dtype)
    w_G = np.asarray(lb_G, dtype)

    MR = K + 3  # mask ring depth: chunk c is read by stages at iters c..c+K-1

    def kernel(*refs):
        seed_ref = None
        if noisy:
            f_hbm, seed_ref, out_hbm = refs[:3]
            mask_hbm = None
            rest = refs[3:]
        elif has_obstacle:
            f_hbm, mask_hbm, out_hbm = refs[:3]
            rest = refs[3:]
        else:
            f_hbm, out_hbm = refs[:2]
            mask_hbm = None
            rest = refs[2:]
        in_ring = rest[0]
        mids = rest[1:1 + (K - 1)]
        out_ring = rest[1 + (K - 1)]
        if has_obstacle:
            mask_ring = rest[2 + (K - 1)]
            sem_in, sem_out, sem_mask = rest[3 + (K - 1):]
        else:
            sem_in, sem_out = rest[2 + (K - 1):]

        laneid = jax.lax.broadcasted_iota(jnp.int32, (CH, nx), 1)
        rowid0 = jax.lax.broadcasted_iota(jnp.int32, (CH, nx), 0)

        def load(c):
            return pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(pl.multiple_of(c * CH, CH), CH), :],
                in_ring.at[c % _T2_NS], sem_in.at[c % _T2_NS])

        def store(c):
            return pltpu.make_async_copy(
                out_ring.at[c % _T2_NO],
                out_hbm.at[:, pl.ds(pl.multiple_of(c * CH, CH), CH), :],
                sem_out.at[c % _T2_NO])

        def load_mask(c):
            return pltpu.make_async_copy(
                mask_hbm.at[pl.ds(pl.multiple_of(c * CH, CH), CH), :],
                mask_ring.at[c % MR], sem_mask.at[c % MR])

        def chunk_step(ring, depth, k, stage=0):
            """One LB step for chunk k, stream halos from ring chunks
            k-1 / k+1 (stale/garbage rows at domain edges are rewritten by
            the BCs)."""
            prev = (k - 1) % depth
            cur = k % depth
            nxt = (k + 1) % depth
            st = []
            for j in range(q):
                cxj, cyj = lattice.cx[j], lattice.cy[j]
                if cyj == 1:
                    rows = jnp.concatenate(
                        [ring[prev, j, CH - 1:CH, :],
                         ring[cur, j, 0:CH - 1, :]], axis=0)
                elif cyj == -1:
                    rows = jnp.concatenate(
                        [ring[cur, j, 1:CH, :],
                         ring[nxt, j, 0:1, :]], axis=0)
                else:
                    rows = ring[cur, j, :, :]
                st.append(_lane_roll(rows, cxj, nx))
            if diffusion:
                # periodic domain, no BCs (diffusion.py:326-331)
                res = _diffusion_collide(st, w_omega, w_ulb, w_vlb,
                                         w_G if lb_G else 0.0, lattice)
                if noisy:
                    # multiplicative demographic noise + negativity clip
                    # (collide_particles_noisy_fisher,
                    #  D2Q9_diffusion.cl:126-167) with the on-core PRNG,
                    # seeded per (sweep, chunk, stage)
                    rho = st[0]
                    for j in range(1, q):
                        rho = rho + st[j]
                    if lb_Dg:
                        seed = (seed_ref[0, 0]
                                ^ (k * np.int32(-1640531535)
                                   + np.int32(stage * 40503)))
                        if interpret:
                            eta = _normal_from_hash(seed, rho.shape)
                        else:
                            pltpu.prng_seed(seed)
                            eta = _normal_from_bits(rho.shape)
                        noise = jnp.sqrt(
                            jnp.maximum(lb_Dg * rho * (1.0 - rho), 0.0)) * eta
                        res = [res[j] + lattice.w[j] * noise
                               for j in range(q)]
                    res = [jnp.maximum(r, 0.0) for r in res]
                return res
            if vel_inlet:
                # y-periodic; wrap seam patched at model level like the
                # diffusion family
                st = _velocity_inlet_tile(st, laneid, nx, w_ulb)
                return _moments_feq_collide(st, None, w_omega, lattice,
                                            incompressible, False)
            rowid = rowid0 + k * CH
            st = _zou_he_inout_narrow(st, rowid, laneid, ny_p, nx_p, w_inlet,
                                      w_outlet, incompressible)
            st = _walls_corners_tile(st, rowid, laneid, ny_p, nx_p, w_inlet,
                                     w_outlet)
            mask = (mask_ring[k % MR] != 0) if has_obstacle else None
            return _moments_feq_collide(st, mask, w_omega, lattice,
                                        incompressible,
                                        zero_vel_in_obstacle=incompressible)

        # prologue: three loads in flight
        load(0).start()
        load(1).start()
        load(2).start()
        if has_obstacle:
            load_mask(0).start()

        def body(k, _):
            # stage 0 (from input) on chunk k
            @pl.when(k == 0)
            def _():
                load(0).wait()

            @pl.when(k + 1 < C)
            def _():
                load(k + 1).wait()

            if has_obstacle:
                # mask chunk k arrives before stage 0 uses it; chunk k+1
                # prefetched (ring depth K+3 > stage span K)
                @pl.when(k < C)
                def _():
                    load_mask(k).wait()

                @pl.when(k + 1 < C)
                def _():
                    load_mask(k + 1).start()

            @pl.when(k < C)
            def _():
                res = chunk_step(in_ring, _T2_NS, k, stage=0)
                for j in range(q):
                    mids[0][k % _T2_NM, j, :, :] = res[j]

            # intermediate stages s = 1..K-2 on chunk k - s
            for s in range(1, K - 1):
                @pl.when((k >= s) & (k - s < C))
                def _(s=s):
                    c = k - s
                    res = chunk_step(mids[s - 1], _T2_NM, c, stage=s)
                    for j in range(q):
                        mids[s][c % _T2_NM, j, :, :] = res[j]

            # final stage on chunk k - (K-1)
            @pl.when(k >= K - 1)
            def _():
                c = k - (K - 1)

                @pl.when(c >= _T2_NO)
                def _():
                    store(c - _T2_NO).wait()

                res = chunk_step(mids[K - 2], _T2_NM, c, stage=K - 1)
                for j in range(q):
                    out_ring[c % _T2_NO, j, :, :] = res[j]
                store(c).start()

            # prefetch: slot (k+3) % NS held chunk k-2, now dead
            @pl.when(k + 3 < C)
            def _():
                load(k + 3).start()
            return 0

        jax.lax.fori_loop(0, C + K - 1, body, 0)
        store(C - 2).wait()
        store(C - 1).wait()

    scratch = [pltpu.VMEM((_T2_NS, q, CH, nx), dtype)]
    scratch += [pltpu.VMEM((_T2_NM, q, CH, nx), dtype) for _ in range(K - 1)]
    scratch += [pltpu.VMEM((_T2_NO, q, CH, nx), dtype)]
    if has_obstacle:
        scratch += [pltpu.VMEM((K + 3, CH, nx), jnp.int32)]
    scratch += [
        pltpu.SemaphoreType.DMA((_T2_NS,)),
        pltpu.SemaphoreType.DMA((_T2_NO,)),
    ]
    if has_obstacle:
        scratch += [pltpu.SemaphoreType.DMA((K + 3,))]

    if noisy:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.SMEM)]
    else:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * (
            2 if has_obstacle else 1)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((q, ny, nx), dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=220 * K * ny * nx,
            bytes_accessed=2 * q * ny * nx * 4,
            transcendentals=0,
        ),
    )

    if noisy:
        def stepK(f, seed):
            return call(f, seed)
    elif has_obstacle:
        def stepK(f, mask):
            return call(f, mask)
    else:
        def stepK(f):
            return call(f)

    return stepK


# ---------------------------------------------------------------------------
# grid-resident kernel: whole state in VMEM, the full run in ONE launch
# ---------------------------------------------------------------------------

_RES_BUDGET = 100 * 1024 * 1024


def supports_resident(ny: int, nx: int, has_obstacle: bool = False,
                      q: int = 9) -> bool:
    """Whole-grid VMEM residency (small grids): lane/sublane-aligned dims
    and ~6x the q-plane state inside the VMEM budget (measured stack peak
    at 768^2 was 5.5x state -> compile-time OOM; 640^2 is the practical
    ceiling). Covers grids up to ~640x640."""
    if nx % 128 or ny % 8 or ny < 8:
        return False
    state = q * ny * nx * 4
    extra = (3 if has_obstacle else 1) * ny * nx * 4
    return 6 * state + extra <= _RES_BUDGET


def make_resident_pipe_step(
    *,
    ny: int,
    nx: int,
    omega: float,
    inlet_rho: float = 1.0,
    outlet_rho: float = 1.0,
    equilibrium: str = "compressible",
    has_obstacle: bool = False,
    lattice: Lattice = D2Q9,
    dtype=jnp.float32,
    interpret: bool = False,
    physics: str = "flow",
    u_lb: float = 0.0,
    v_lb: float = 0.0,
    lb_G: float = 0.0,
    lb_Dg: float = 0.0,
    ny_phys: int | None = None,
    nx_phys: int | None = None,
    unroll: int | None = None,
):
    """Build ``run(f, n[, mask|seed]) -> f`` advancing ``n`` LB steps in a
    single kernel launch with the whole state resident in VMEM.

    Small grids (the reference's own 32x256 benchmark geometry,
    ``docs/python_cython_opencl_comparison.ipynb``) are dispatch-bound on
    the sweep kernels: ~8 us of launch overhead per HBM sweep dwarfs the
    ~0.3 MB of state. Here the state is read from HBM once, stepped ``n``
    times entirely out of VMEM (streaming = in-register row/lane shifts,
    BCs = masked selects, same tile math as the sweep kernels), and written
    back once — zero HBM traffic and zero dispatch inside the run. ``n`` is
    a runtime scalar (SMEM), so one compiled executable serves any
    iteration count.
    """
    if not supports_resident(ny, nx, has_obstacle, lattice.q):
        raise ValueError(f"grid {ny}x{nx} not VMEM-resident-capable")
    q = lattice.q
    incompressible = equilibrium == "incompressible"
    ny_p = ny_phys if ny_phys is not None else ny
    nx_p = nx_phys if nx_phys is not None else nx
    assert physics == "flow" or (ny_p == ny and nx_p == nx)
    assert physics in ("flow", "diffusion", "noisy_fisher", "velocity_inlet")
    diffusion = physics in ("diffusion", "noisy_fisher")
    noisy = physics == "noisy_fisher"
    vel_inlet = physics == "velocity_inlet"
    w_inlet = np.asarray(inlet_rho, dtype)
    w_outlet = np.asarray(outlet_rho, dtype)
    w_omega = np.asarray(omega, dtype)
    w_ulb = np.asarray(u_lb, dtype)
    w_vlb = np.asarray(v_lb, dtype)
    w_G = np.asarray(lb_G, dtype)

    def _shift_y(p, cyj):
        # full-grid periodic row shift via slice-concat (stale wrap rows are
        # rewritten by the BCs, exactly as in the sweep kernels)
        if cyj == 1:
            return jnp.concatenate([p[ny - 1:ny, :], p[:ny - 1, :]], axis=0)
        if cyj == -1:
            return jnp.concatenate([p[1:, :], p[0:1, :]], axis=0)
        return p

    def kernel(*refs):
        if noisy:
            n_ref, f_ref, seed_ref, out_ref = refs
            mask_ref = None
        elif has_obstacle:
            n_ref, f_ref, mask_ref, out_ref = refs
        else:
            n_ref, f_ref, out_ref = refs
            mask_ref = None

        rowid = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
        laneid = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
        mask = (mask_ref[:, :] != 0) if has_obstacle else None

        def body(i, planes):
            st = [
                _lane_roll(_shift_y(planes[j], lattice.cy[j]),
                           lattice.cx[j], nx)
                for j in range(q)
            ]
            if diffusion:
                res = _diffusion_collide(st, w_omega, w_ulb, w_vlb,
                                         w_G if lb_G else 0.0, lattice)
                if noisy:
                    rho = st[0]
                    for j in range(1, q):
                        rho = rho + st[j]
                    if lb_Dg:
                        # per-step reseed (launch seed ^ step index hash);
                        # same scheme as the temporal kernel's per-(sweep,
                        # chunk, stage) seeding, different realization
                        seed = seed_ref[0, 0] ^ (i * np.int32(-1640531535))
                        if interpret:
                            eta = _normal_from_hash(seed, rho.shape)
                        else:
                            pltpu.prng_seed(seed)
                            eta = _normal_from_bits(rho.shape)
                        noise = jnp.sqrt(
                            jnp.maximum(lb_Dg * rho * (1.0 - rho), 0.0)) * eta
                        res = [res[j] + lattice.w[j] * noise
                               for j in range(q)]
                    res = [jnp.maximum(r, 0.0) for r in res]
                return tuple(res)
            if vel_inlet:
                st = _velocity_inlet_tile(st, laneid, nx, w_ulb)
                return tuple(_moments_feq_collide(
                    st, None, w_omega, lattice, incompressible, False))
            st = _zou_he_tile(st, rowid, laneid, ny_p, nx_p, w_inlet,
                              w_outlet, incompressible)
            return tuple(_moments_feq_collide(
                st, mask, w_omega, lattice, incompressible,
                zero_vel_in_obstacle=incompressible))

        planes = tuple(f_ref[j] for j in range(q))
        # Unroll U steps per loop iteration: small grids are op-latency
        # bound (each [ny, nx] op is a handful of VPU tiles) and the
        # unrolled body lets Mosaic keep planes in vector registers
        # across steps. Measured MLUPS by U (TPU v5e,
        # benchmarks/sweep_resident_unroll.py):
        #   32x256: 593 / 3448 / 5284 / 4950   (U = 1 / 4 / 8 / 16)
        #   256^2:  12610 / 16953 / 3356       (U = 1 / 2 / 4)
        #   384^2:  17964 / 22011              (U = 1 / 4)
        #   512^2:  11599 / 25135              (U = 1 / 4)
        #   640^2:  15521 / 18911              (U = 1 / 4)
        # Non-monotone in size (register-allocation cliffs), so the auto
        # table is empirical; pass `unroll` to override.
        if unroll is not None:
            U = int(unroll)
        elif noisy:
            U = 1
        elif ny * nx <= 48 * 1024:
            U = 8
        elif ny * nx <= 96 * 1024:
            U = 2
        else:
            U = 4
        n = n_ref[0, 0]
        if U > 1:
            def bodyU(i, pl_):
                for _ in range(U):
                    pl_ = body(0, pl_)
                return pl_
            planes = jax.lax.fori_loop(0, n // U, bodyU, planes)
            planes = jax.lax.fori_loop(0, n % U, body, planes)
        else:
            planes = jax.lax.fori_loop(0, n, body, planes)
        for j in range(q):
            out_ref[j] = planes[j]

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    if noisy:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    elif has_obstacle:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((q, ny, nx), dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )

    if noisy:
        def run(f, n, seed):
            return call(jnp.asarray(n, jnp.int32).reshape(1, 1), f,
                        jnp.asarray(seed, jnp.int32).reshape(1, 1))
    elif has_obstacle:
        def run(f, n, mask):
            return call(jnp.asarray(n, jnp.int32).reshape(1, 1), f, mask)
    else:
        def run(f, n):
            return call(jnp.asarray(n, jnp.int32).reshape(1, 1), f)

    return run


# ---------------------------------------------------------------------------
# temporal-blocked kernel for the deterministic multifield family
# ---------------------------------------------------------------------------

def _mf_expansion_tile(st, omegas, lb_G, lb_Dg, cutoff, u_lb, v_lb,
                       lattice, eta_fn):
    """Periodic stochastic range expansion with nutrient
    (``D2Q9_multifield_diffusion.cl:80-168``): clipped hydro, growth
    ``G_p rho_p c``, Milstein noise per population, nutrient consumption
    ``-sum react_p``, zero/negativity/NaN clipping. ``st`` is ``[q][F]``
    streamed planes; ``eta_fn(p, shape)`` returns the population-p normal
    field (or None when that population is noiseless)."""
    q = lattice.q
    F = len(omegas)
    Pp = F - 1
    cs2 = lattice.cs2
    rhos = []
    for p in range(F):
        r = st[0][p]
        for j in range(1, q):
            r = r + st[j][p]
        # clipped hydro (D2Q9_multifield_diffusion.cl:62-75). The >=
        # form is bit-identical to `where((r < cutoff) | isnan(r), 0, r)`
        # — NaN compares false against everything, so it lands in the
        # zero branch either way — but is 2 VPU ops cheaper per field,
        # and this kernel is VPU-op-bound (benchmarks/profile_expansion).
        rhos.append(jnp.where(r >= cutoff, r, 0.0))
    c_nut = rhos[Pp]

    reacts = []
    for p in range(Pp):
        r = lb_G[p] * rhos[p] * c_nut
        if lb_Dg[p]:
            eta = eta_fn(p, c_nut.shape)
            # Milstein update (D2Q9_multifield_diffusion.cl:118-121)
            amp = jnp.sqrt(jnp.maximum(lb_Dg[p] * rhos[p] * c_nut, 0.0))
            r = (r + amp * eta
                 + (lb_Dg[p] * 0.25) * c_nut * (eta * eta - 1.0))
        reacts.append(r)
    react_n = -reacts[0]
    for p in range(1, Pp):
        react_n = react_n - reacts[p]

    out = [[None] * F for _ in range(q)]
    # Collide, reassociated for the VPU (this kernel is VPU-op-bound —
    # benchmarks/profile_expansion.py): hoist om*rho_p per field, share
    # the cu==0 inner term across planes, and fold the negativity/NaN
    # clip into one select (val >= 0 is false for NaN, so the isnan()
    # of D2Q9_multifield_diffusion.cl:137-142 is free). ~5 VPU ops per
    # plane vs ~10 in the direct transcription.
    for p in range(F):
        om = omegas[p]
        A = 1.0 - om
        rho_p = rhos[p]
        react = reacts[p] if p < Pp else react_n
        good_rho = rho_p >= cutoff  # post-clip: rho is 0 or >= cutoff
        orho = om * rho_p
        base = orho + react         # shared by every direction with cu==0
        for j in range(q):
            cu = float(lattice.cx[j] * u_lb + lattice.cy[j] * v_lb)
            inner = base if cu == 0.0 else (1.0 + cu / cs2) * orho + react
            val = st[j][p] * A + lattice.w[j] * inner
            out[j][p] = jnp.where(good_rho & (val >= 0), val, 0.0)
    return out


def _mf_noflux_walls(st, rowid, laneid, ny, nx):
    """No-flux walls + corners per field as masked selects
    (``D2Q9_multifield_fisher.cl:184-289``). ``st`` is ``[q][F]`` streamed
    planes; masks use global coordinates so the same code serves full
    arrays, kernel chunks, and shards. (Masked selects, not ``.at[].set``
    scatters: GSPMD miscompiles edge scatters on y-sharded arrays by
    applying the global row -1 update to every shard's last local row.)"""
    q = len(st)
    F = len(st[0])
    row_int = (rowid >= 1) & (rowid <= ny - 2)
    lane_int = (laneid >= 1) & (laneid <= nx - 2)
    lane0 = laneid == 0
    laneN = laneid == nx - 1
    row0 = rowid == 0
    rowN = rowid == ny - 1
    m_n = rowN & lane_int
    m_s = row0 & lane_int
    m_e = laneN & row_int
    m_w = lane0 & row_int
    ul = rowN & lane0
    ur = rowN & laneN
    br = row0 & laneN
    bl = row0 & lane0
    for p in range(F):
        s = tuple(st[j][p] for j in range(q))
        # north: f7<-f5, f4<-f2, f8<-f6 ; south: f2<-f4, f5<-f7, f6<-f8
        st[7][p] = jnp.where(m_n, s[5], st[7][p])
        st[4][p] = jnp.where(m_n, s[2], st[4][p])
        st[8][p] = jnp.where(m_n, s[6], st[8][p])
        st[2][p] = jnp.where(m_s, s[4], st[2][p])
        st[5][p] = jnp.where(m_s, s[7], st[5][p])
        st[6][p] = jnp.where(m_s, s[8], st[6][p])
        # east: f3<-f1, f6<-f8, f7<-f5 ; west: f1<-f3, f5<-f7, f8<-f6
        st[3][p] = jnp.where(m_e, s[1], st[3][p])
        st[6][p] = jnp.where(m_e, s[8], st[6][p])
        st[7][p] = jnp.where(m_e, s[5], st[7][p])
        st[1][p] = jnp.where(m_w, s[3], st[1][p])
        st[5][p] = jnp.where(m_w, s[7], st[5][p])
        st[8][p] = jnp.where(m_w, s[6], st[8][p])
        # corners (3 populations each)
        st[1][p] = jnp.where(ul | bl, s[3], st[1][p])
        st[4][p] = jnp.where(ul | ur, s[2], st[4][p])
        st[8][p] = jnp.where(ul, s[6], st[8][p])
        st[3][p] = jnp.where(ur | br, s[1], st[3][p])
        st[7][p] = jnp.where(ur, s[5], st[7][p])
        st[2][p] = jnp.where(br | bl, s[4], st[2][p])
        st[6][p] = jnp.where(br, s[8], st[6][p])
        st[5][p] = jnp.where(bl, s[7], st[5][p])
    return st


def _mf_fisher_tile(st, rowid, laneid, ny, nx, omegas, lb_G, u_lb, v_lb,
                    lattice):
    """No-flux walls + corners per field
    (``D2Q9_multifield_fisher.cl:184-289``) followed by logistic-competition
    collide (``:74-122``). ``st`` is ``[q][F]`` streamed planes with
    global-coordinate masks from ``rowid``/``laneid``."""
    q = lattice.q
    F = len(omegas)
    st = _mf_noflux_walls(st, rowid, laneid, ny, nx)

    # moments + logistic competition + linear feq + per-field omega
    rhos = []
    for p in range(F):
        r = st[0][p]
        for j in range(1, q):
            r = r + st[j][p]
        rhos.append(r)
    rho_tot = rhos[0]
    for p in range(1, F):
        rho_tot = rho_tot + rhos[p]
    one_minus = 1.0 - rho_tot

    out = [[None] * F for _ in range(q)]
    cs2 = lattice.cs2
    for p in range(F):
        om = omegas[p]
        A = 1.0 - om
        growth = lb_G[p] * rhos[p] * one_minus
        for j in range(q):
            cu = lattice.cx[j] * u_lb + lattice.cy[j] * v_lb
            coef = lattice.w[j] * (1.0 + cu / cs2)
            out[j][p] = (st[j][p] * A + (om * coef) * rhos[p]
                         + lattice.w[j] * growth)
    return out


def supports_temporal_multifield(ny: int, nx: int, num_fields: int,
                                 k_steps: int = 2) -> bool:
    if not (nx % 128 == 0 and ny % _T2_CH == 0
            and ny // _T2_CH >= max(_T2_NS, 3 + k_steps)):
        return False
    slots = _T2_NS + (k_steps - 1) * _T2_NM + _T2_NO
    ring_bytes = slots * 9 * num_fields * _T2_CH * nx * 4
    return ring_bytes < 64 * 1024 * 1024


def make_temporal_multifield_step(
    *,
    ny: int,
    nx: int,
    num_fields: int,
    omegas,
    lb_G,
    u_lb: float = 0.0,
    v_lb: float = 0.0,
    lattice: Lattice = D2Q9,
    dtype=jnp.float32,
    interpret: bool = False,
    k_steps: int = 2,
    physics: str = "fisher",
    lb_Dg=None,
    cutoff: float = 0.01,
):
    """K-step temporal kernel for :class:`~lb2d_tpu.models.multifield.
    FisherExpansion`: F competing populations with logistic competition
    against the total density (``D2Q9_multifield_fisher.cl:74-122``) and
    no-flux walls on all four sides (``:184-289``).

    State enters as ``f[Q * F, ny, nx]`` (plane ``j * F + p`` = direction j
    of field p). The no-flux walls rewrite exactly the populations whose
    stream halos are garbage at the domain edges, so — like the flow kernel
    and unlike the periodic diffusion kernel — no seam patch is needed.
    """
    CH = _T2_CH
    K = int(k_steps)
    F = int(num_fields)
    assert K >= 2
    if not supports_temporal_multifield(ny, nx, F, K):
        raise ValueError(f"no multifield temporal tiling for {ny}x{nx} F={F}")
    C = ny // CH
    q = lattice.q
    P = q * F
    omegas = [float(o) for o in np.asarray(omegas).ravel()]
    lb_G = [float(g) for g in np.asarray(lb_G).ravel()]
    expansion = physics == "expansion"
    if expansion:
        # F = P populations + 1 nutrient; omegas has F entries (nutrient
        # last), lb_G / lb_Dg have P (stochastic_nutrients.py:218-248)
        lb_Dg = [float(d) for d in np.asarray(lb_Dg).ravel()]
        assert len(omegas) == F and len(lb_G) == F - 1
        assert len(lb_Dg) == F - 1
        noisy = any(lb_Dg)
    else:
        assert physics == "fisher"
        assert len(omegas) == F and len(lb_G) == F
        noisy = False
    w_ulb = np.asarray(u_lb, dtype)
    w_vlb = np.asarray(v_lb, dtype)

    def kernel(*refs):
        if noisy:
            f_hbm, seed_ref, out_hbm, in_ring, *rest = refs
        else:
            f_hbm, out_hbm, in_ring, *rest = refs
            seed_ref = None
        mids = rest[:K - 1]
        out_ring = rest[K - 1]
        sem_in, sem_out = rest[K:]

        laneid = jax.lax.broadcasted_iota(jnp.int32, (CH, nx), 1)
        rowid0 = jax.lax.broadcasted_iota(jnp.int32, (CH, nx), 0)

        def load(c):
            return pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(pl.multiple_of(c * CH, CH), CH), :],
                in_ring.at[c % _T2_NS], sem_in.at[c % _T2_NS])

        def store(c):
            return pltpu.make_async_copy(
                out_ring.at[c % _T2_NO],
                out_hbm.at[:, pl.ds(pl.multiple_of(c * CH, CH), CH), :],
                sem_out.at[c % _T2_NO])

        def _expansion_collide(st, k, stage):
            """Normals from the on-core PRNG, one seed per (sweep, chunk,
            stage); noisy populations consume Box-Muller draws in PAIRS
            (the cos/sin branches are independent), halving the PRNG and
            transcendental cost per step — the dominant term in the
            Expansion kernel's gap to its deterministic sibling
            (VERDICT r3 #4). Physics in :func:`_mf_expansion_tile`."""
            noisy_ps = [p for p in range(F - 1) if lb_Dg[p]]
            etas = {}
            if noisy and not interpret:
                pltpu.prng_seed(seed_ref[0, 0]
                                ^ (k * np.int32(-1640531535)
                                   + np.int32(stage * 40503)))
            for a in range(0, len(noisy_ps), 2):
                shape = (CH, nx)
                if interpret:
                    seed = (seed_ref[0, 0]
                            ^ (k * np.int32(-1640531535)
                               + np.int32(stage * 40503 + a * 7919)))
                    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
                    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
                    cell = rows * np.uint32(shape[1]) + cols
                    s = jax.lax.bitcast_convert_type(seed, jnp.uint32)
                    e1, e2 = _box_muller_pair(
                        _hash_u32(cell ^ s),
                        _hash_u32(cell ^ s ^ np.uint32(0x9E3779B9)))
                else:
                    e1, e2 = _normal_pair_from_bits(shape)
                etas[noisy_ps[a]] = e1
                if a + 1 < len(noisy_ps):
                    etas[noisy_ps[a + 1]] = e2

            eta_fn = lambda p, shape: etas[p]
            return _mf_expansion_tile(st, omegas, lb_G, lb_Dg, cutoff,
                                      w_ulb, w_vlb, lattice, eta_fn)

        def chunk_step(ring, depth, k, stage=0):
            prev = (k - 1) % depth
            cur = k % depth
            nxt = (k + 1) % depth
            # stream: plane index j*F + p shifts by c_j
            st = [[None] * F for _ in range(q)]
            for j in range(q):
                cxj, cyj = lattice.cx[j], lattice.cy[j]
                for p in range(F):
                    pi = j * F + p
                    if cyj == 1:
                        rows = jnp.concatenate(
                            [ring[prev, pi, CH - 1:CH, :],
                             ring[cur, pi, 0:CH - 1, :]], axis=0)
                    elif cyj == -1:
                        rows = jnp.concatenate(
                            [ring[cur, pi, 1:CH, :],
                             ring[nxt, pi, 0:1, :]], axis=0)
                    else:
                        rows = ring[cur, pi, :, :]
                    st[j][p] = _lane_roll(rows, cxj, nx)

            if expansion:
                return _expansion_collide(st, k, stage)

            # no-flux walls + logistic competition (shared tile fn)
            rowid = rowid0 + k * CH
            return _mf_fisher_tile(st, rowid, laneid, ny, nx, omegas, lb_G,
                                   w_ulb, w_vlb, lattice)

        load(0).start()
        load(1).start()
        load(2).start()

        def body(k, _):
            @pl.when(k == 0)
            def _():
                load(0).wait()

            @pl.when(k + 1 < C)
            def _():
                load(k + 1).wait()

            @pl.when(k < C)
            def _():
                res = chunk_step(in_ring, _T2_NS, k, stage=0)
                for j in range(q):
                    for p in range(F):
                        mids[0][k % _T2_NM, j * F + p, :, :] = res[j][p]

            for s_ in range(1, K - 1):
                @pl.when((k >= s_) & (k - s_ < C))
                def _(s_=s_):
                    c = k - s_
                    res = chunk_step(mids[s_ - 1], _T2_NM, c, stage=s_)
                    for j in range(q):
                        for p in range(F):
                            mids[s_][c % _T2_NM, j * F + p, :, :] = res[j][p]

            @pl.when(k >= K - 1)
            def _():
                c = k - (K - 1)

                @pl.when(c >= _T2_NO)
                def _():
                    store(c - _T2_NO).wait()

                res = chunk_step(mids[K - 2], _T2_NM, c, stage=K - 1)
                for j in range(q):
                    for p in range(F):
                        out_ring[c % _T2_NO, j * F + p, :, :] = res[j][p]
                store(c).start()

            @pl.when(k + 3 < C)
            def _():
                load(k + 3).start()
            return 0

        jax.lax.fori_loop(0, C + K - 1, body, 0)
        store(C - 2).wait()
        store(C - 1).wait()

    scratch = [pltpu.VMEM((_T2_NS, P, CH, nx), dtype)]
    scratch += [pltpu.VMEM((_T2_NM, P, CH, nx), dtype) for _ in range(K - 1)]
    scratch += [
        pltpu.VMEM((_T2_NO, P, CH, nx), dtype),
        pltpu.SemaphoreType.DMA((_T2_NS,)),
        pltpu.SemaphoreType.DMA((_T2_NO,)),
    ]

    if noisy:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pltpu.SMEM)]
    else:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, ny, nx), dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=220 * K * F * ny * nx,
            bytes_accessed=2 * P * ny * nx * 4,
            transcendentals=0,
        ),
    )

    if noisy:
        def stepK(f_qf, seed):
            """f_qf: [Q, F, ny, nx]; seed: int32 [1, 1]."""
            flat = f_qf.reshape(P, ny, nx)
            out = call(flat, seed)
            return out.reshape(q, F, ny, nx)
    else:
        def stepK(f_qf):
            """f_qf: [Q, F, ny, nx] -> same; internally flattened."""
            flat = f_qf.reshape(P, ny, nx)
            out = call(flat)
            return out.reshape(q, F, ny, nx)

    return stepK


# ---------------------------------------------------------------------------
# single-launch band kernel for the Expansion periodic seam patch
# ---------------------------------------------------------------------------

def make_expansion_band_step(
    *,
    band_rows: int,
    nx: int,
    num_fields: int,
    omegas,
    lb_G,
    lb_Dg,
    cutoff: float,
    u_lb: float = 0.0,
    v_lb: float = 0.0,
    k_steps: int = 2,
    lattice: Lattice = D2Q9,
    dtype=jnp.float32,
    interpret: bool = False,
):
    """K Expansion steps on the periodic y-wrap seam band, whole band
    resident in VMEM, ONE kernel launch.

    Replaces the K serialized XLA steps the seam patch used through
    round 4 — those were launch-overhead bound (~0.10 ms/step at 1024²
    K=8, benchmarks/profile_expansion.py). The band is the ``band_rows``
    rows centred on the wrap, gathered by the caller with periodic
    indexing; the kernel streams periodically WITHIN the band, so the
    band's own internal seam sits ``band_rows/2 - K >= K`` rows away
    from every emitted row and its garbage cone never reaches the
    output. Emits the ``2*k_steps`` rows centred on the wrap.

    Noise is the same Milstein scheme as the main kernel
    (``D2Q9_multifield_diffusion.cl:118-121``), drawn from the on-core
    PRNG with the caller's band seed — a different stream from both the
    main kernel and the old ``jax.random`` patch (the stitched-
    realization caveat of DIVERGENCES.md #19 is unchanged).
    """
    R = int(band_rows)
    K = int(k_steps)
    F = int(num_fields)
    q = lattice.q
    P = q * F
    OUT = 2 * K
    o0 = (R - OUT) // 2
    assert R >= 2 * OUT, (R, K)  # garbage cone must not reach the output
    omegas = [float(o) for o in np.asarray(omegas).ravel()]
    lb_G = [float(g) for g in np.asarray(lb_G).ravel()]
    lb_Dg = [float(d) for d in np.asarray(lb_Dg).ravel()]
    noisy = any(lb_Dg)
    w_ulb = np.asarray(u_lb, dtype)
    w_vlb = np.asarray(v_lb, dtype)
    noisy_ps = [p for p in range(F - 1) if lb_Dg[p]]

    def kernel(*refs):
        if noisy:
            band_ref, seed_ref, out_ref = refs
        else:
            band_ref, out_ref = refs
            seed_ref = None
        planes = [[band_ref[j * F + p] for p in range(F)] for j in range(q)]
        for k in range(K):
            st = [[None] * F for _ in range(q)]
            for j in range(q):
                cxj, cyj = lattice.cx[j], lattice.cy[j]
                for p in range(F):
                    pln = planes[j][p]
                    if cyj == 1:
                        rows = jnp.concatenate(
                            [pln[R - 1:R], pln[:R - 1]], axis=0)
                    elif cyj == -1:
                        rows = jnp.concatenate(
                            [pln[1:R], pln[0:1]], axis=0)
                    else:
                        rows = pln
                    st[j][p] = _lane_roll(rows, cxj, nx)

            etas = {}
            if noisy and not interpret:
                pltpu.prng_seed(seed_ref[0, 0] ^ np.int32(k * 40503 + 12345))
            for a in range(0, len(noisy_ps), 2):
                shape = (R, nx)
                if interpret:
                    seed = seed_ref[0, 0] ^ np.int32(
                        k * 40503 + a * 7919 + 12345)
                    rows_i = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
                    cols_i = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
                    cell = rows_i * np.uint32(shape[1]) + cols_i
                    s = jax.lax.bitcast_convert_type(seed, jnp.uint32)
                    e1, e2 = _box_muller_pair(
                        _hash_u32(cell ^ s),
                        _hash_u32(cell ^ s ^ np.uint32(0x9E3779B9)))
                else:
                    e1, e2 = _normal_pair_from_bits(shape)
                etas[noisy_ps[a]] = e1
                if a + 1 < len(noisy_ps):
                    etas[noisy_ps[a + 1]] = e2

            eta_fn = lambda p, shape: etas[p]
            planes = _mf_expansion_tile(st, omegas, lb_G, lb_Dg, cutoff,
                                        w_ulb, w_vlb, lattice, eta_fn)

        for j in range(q):
            for p in range(F):
                out_ref[j * F + p] = planes[j][p][o0:o0 + OUT]

    in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    if noisy:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, OUT, nx), dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )

    if noisy:
        def run(band_qf, seed):
            """band_qf: [Q, F, band_rows, nx]; seed: int32 scalar."""
            flat = band_qf.reshape(P, R, nx)
            out = call(flat, jnp.asarray(seed, jnp.int32).reshape(1, 1))
            return out.reshape(q, F, OUT, nx)
    else:
        def run(band_qf):
            flat = band_qf.reshape(P, R, nx)
            return call(flat).reshape(q, F, OUT, nx)

    return run
