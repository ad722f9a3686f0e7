"""Halo-aware temporal-blocked kernel: the Pallas fast path *inside*
``shard_map``.

The reference scales nothing (single device, ``opencl_dim.py:239-240``); the
XLA sharded step in :mod:`lb2d_tpu.parallel.sharded` scales but runs ~12x
below the single-chip temporal kernel. This module closes that gap: the
K-step temporal kernel of :mod:`lb2d_tpu.ops.fused` is reshaped to run on a
*local shard* ``f_loc[q, H, nx]`` plus one CH-row halo chunk from each
y-neighbor (exchanged with ``jax.lax.ppermute`` outside the kernel, over ICI
on a real mesh).

Correctness of the one-chunk halo: inside the kernel the halo chunks are
processed like ordinary chunks but never stored. The halo chunk's outer edge
reads a stale ring slot, so after internal stage ``s`` its ``s+1`` outermost
rows are corrupt; the first stored chunk only ever reads the halo chunk's
*innermost* row, which stays valid while ``K <= CH``. At global domain edges
(flow physics) the wrapped-in halo data is garbage by construction and the
wall/corner BCs rewrite exactly the populations streamed through it — the
same argument as the unsharded kernel's y-wrap. For periodic physics
(diffusion family) the ppermute ring *is* the true periodic wrap, so the
sharded kernel needs no seam patch at all (unlike the unsharded temporal
kernel, cf. DIVERGENCES.md #19).

On a 1-device mesh the ppermute is the identity: the halo chunks are the
local wrap rows and the kernel reproduces the unsharded temporal kernel's
semantics bit-for-bit, at its full throughput (the two extra halo-chunk
DMAs are ~2*CH/H of the sweep traffic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.lattice import Lattice, D2Q9
from .fused import (
    _diffusion_collide,
    _lane_roll,
    _mf_expansion_tile,
    _mf_fisher_tile,
    _moments_feq_collide,
    _normal_from_bits,
    _normal_from_hash,
    _velocity_inlet_tile,
    _walls_corners_tile,
    _zou_he_inout_ext,
    _zou_he_inout_narrow,
)

__all__ = [
    "supports_temporal_halo",
    "pick_halo_chunk",
    "make_temporal_halo_step",
]

_NS = 5   # step-0 input ring depth
_NM = 4   # intermediate ring depth per internal step
_NO = 2   # output ring depth
_VMEM_BUDGET = 88 * 1024 * 1024


def _ring_slots(k_steps: int) -> int:
    return _NS + (k_steps - 1) * _NM + _NO


def pick_halo_chunk(H: int, nx: int, k_steps: int,
                    num_fields: int = 1) -> int | None:
    """Chunk height CH for the halo kernel on an ``H``-row shard: the halo
    is exactly one chunk per side, so ``K <= CH``; DMA slices need 8-row
    alignment; the VMEM rings must fit. Wide grids (nx=8192) drop to CH=8,
    which is what lets them keep K=8 (ring bytes scale with CH*nx)."""
    if nx % 128 != 0:
        return None
    for ch in (16, 8):
        if k_steps > ch or H % ch:
            continue
        V = H // ch + 2  # virtual chunks incl. the two halo chunks
        if V < max(_NS, 3 + k_steps):
            continue
        ring = _ring_slots(k_steps) * 9 * num_fields * ch * nx * 4
        if ring <= _VMEM_BUDGET:
            return ch
    return None


def supports_temporal_halo(H: int, nx: int, k_steps: int) -> bool:
    return k_steps >= 1 and pick_halo_chunk(H, nx, k_steps) is not None


def make_temporal_halo_step(
    *,
    ny: int,
    nx: int,
    H: int,
    omega: float,
    inlet_rho: float = 1.0,
    outlet_rho: float = 1.0,
    equilibrium: str = "compressible",
    lattice: Lattice = D2Q9,
    dtype=jnp.float32,
    interpret: bool = False,
    k_steps: int = 2,
    physics: str = "flow",
    u_lb: float = 0.0,
    v_lb: float = 0.0,
    lb_G: float = 0.0,
    lb_Dg: float = 0.0,
    chunk: int | None = None,
    num_fields: int = 1,
    omegas=None,
    lb_Gs=None,
    lb_Dgs=None,
    cutoff: float = 0.01,
    x_ext: int = 0,
    W: int | None = None,
):
    """Build ``stepK(f_loc, top_halo, bot_halo, y0 [, seed]) -> f_loc``
    advancing one y-shard by ``k_steps`` LB steps.

    ``f_loc`` is ``[q, H, nx]`` (the shard's rows, global rows
    ``[y0, y0+H)``), ``top_halo``/``bot_halo`` are ``[q, CH, nx]`` — the
    previous neighbor's *last* CH rows and the next neighbor's *first* CH
    rows at the current time step. ``y0`` is an int32 ``[1, 1]`` array (the
    shard's global row offset; traced, so one kernel serves every shard in
    the SPMD program). ``seed`` (noisy_fisher only) is an int32 ``[1, 1]``
    per-(step-group, shard) seed for the on-core PRNG.

    ``k_steps=1`` degenerates to a halo'd single-sweep pipelined kernel
    (no intermediate rings).

    **2-D meshes** (``x_ext=128``): the shard's body is ``W`` lanes wide and
    every input arrives x-halo-extended to ``W + 2*x_ext`` lanes (the
    caller ppermutes 128-lane strips from the x-neighbors — of the
    y-extended arrays, so diagonal corners ride along). Lane rolls wrap at
    the extended width; the wrap corruption creeps one lane per internal
    stage from each strip edge, so the stored body lanes (offset 128)
    stay exact while ``K <= 128``. The extra SMEM scalar ``x0`` is the
    shard's global first body lane. Flow + diffusion physics only.
    """
    K = int(k_steps)
    assert K >= 1
    F = int(num_fields)
    BX = int(x_ext)
    W = int(W) if W is not None else nx
    nxE = W + 2 * BX                 # kernel working width
    if BX:
        assert BX == 128 and W % 128 == 0 and W >= 128 and K <= BX
    CH = chunk if chunk is not None else pick_halo_chunk(H, nxE, K, F)
    if CH is None or K > CH or H % CH:
        raise ValueError(f"no halo-temporal tiling for shard {H}x{nxE}, K={K}")
    C = H // CH        # stored chunks
    V = C + 2          # virtual chunks: halo, C body chunks, halo
    assert V >= max(_NS, 3 + K), (V, K)
    q = lattice.q
    incompressible = equilibrium == "incompressible"
    assert physics in ("flow", "diffusion", "noisy_fisher", "velocity_inlet",
                       "multifield_fisher", "multifield_expansion")
    mf = physics.startswith("multifield")
    assert (F > 1) == mf
    if BX:
        # flow: Zou-He columns take the x-extended tile form; diffusion /
        # expansion: fully periodic, nothing lane-dependent; multifield
        # fisher: the no-flux x-wall masks use the globalized laneid (the
        # x0 offset above), and the CALLER must splice an x-wall band
        # exactly as it splices the y-wall band (garbage creeps one lane
        # per stage from the torus-wrapped strips at the global x edges —
        # see ShardedMultifield).
        assert physics in ("flow", "diffusion", "noisy_fisher",
                           "multifield_fisher", "multifield_expansion")
    P = q * F
    diffusion = physics in ("diffusion", "noisy_fisher")
    if mf:
        omegas = [float(o) for o in np.asarray(omegas).ravel()]
        lb_Gs = [float(g) for g in np.asarray(lb_Gs).ravel()]
        assert len(omegas) == F
        if physics == "multifield_expansion":
            lb_Dgs = [float(d) for d in np.asarray(lb_Dgs).ravel()]
            assert len(lb_Gs) == F - 1 and len(lb_Dgs) == F - 1
            noisy = any(lb_Dgs)
        else:
            assert len(lb_Gs) == F
            noisy = False
    else:
        noisy = physics == "noisy_fisher"
    vel_inlet = physics == "velocity_inlet"
    w_inlet = np.asarray(inlet_rho, dtype)
    w_outlet = np.asarray(outlet_rho, dtype)
    w_omega = np.asarray(omega, dtype)
    w_ulb = np.asarray(u_lb, dtype)
    w_vlb = np.asarray(v_lb, dtype)
    w_G = np.asarray(lb_G, dtype)

    def kernel(*refs):
        x0_ref = None
        if BX and noisy:
            f_hbm, top_hbm, bot_hbm, y0_ref, x0_ref, seed_ref, out_hbm = refs[:7]
            rest = refs[7:]
        elif BX:
            f_hbm, top_hbm, bot_hbm, y0_ref, x0_ref, out_hbm = refs[:6]
            seed_ref = None
            rest = refs[6:]
        elif noisy:
            f_hbm, top_hbm, bot_hbm, y0_ref, seed_ref, out_hbm = refs[:6]
            rest = refs[6:]
        else:
            f_hbm, top_hbm, bot_hbm, y0_ref, out_hbm = refs[:5]
            seed_ref = None
            rest = refs[5:]
        in_ring = rest[0]
        mids = rest[1:K]            # K-1 intermediate rings
        out_ring = rest[K]
        sem_in, sem_out = rest[K + 1:]

        y0 = y0_ref[0, 0]
        laneid = jax.lax.broadcasted_iota(jnp.int32, (CH, nxE), 1)
        if BX:
            # global lane coordinate of each extended-tile lane
            laneid = laneid + (x0_ref[0, 0] - BX)
        rowid0 = jax.lax.broadcasted_iota(jnp.int32, (CH, nxE), 0)

        def load(c):
            """Start the DMA for virtual chunk c: 0 -> top halo, 1..C ->
            f_loc chunk c-1, C+1 -> bottom halo. All three sources have the
            same [q, CH, nx] shape, so one wait descriptor serves them."""
            slot = c % _NS

            @pl.when(c == 0)
            def _():
                pltpu.make_async_copy(
                    top_hbm, in_ring.at[slot], sem_in.at[slot]).start()

            @pl.when((c >= 1) & (c <= C))
            def _():
                pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(
                        pl.multiple_of((c - 1) * CH, CH), CH), :],
                    in_ring.at[slot], sem_in.at[slot]).start()

            @pl.when(c == V - 1)
            def _():
                pltpu.make_async_copy(
                    bot_hbm, in_ring.at[slot], sem_in.at[slot]).start()

        def load_wait(c):
            slot = c % _NS
            pltpu.make_async_copy(
                top_hbm, in_ring.at[slot], sem_in.at[slot]).wait()

        def store(c):
            """Store virtual chunk c (1 <= c <= C) to out rows (c-1)*CH."""
            return pltpu.make_async_copy(
                out_ring.at[c % _NO],
                out_hbm.at[:, pl.ds(
                    pl.multiple_of((c - 1) * CH, CH), CH), :],
                sem_out.at[c % _NO])

        def chunk_step(ring, depth, c, stage):
            """One LB step for virtual chunk c; halos from ring chunks
            c-1 / c+1 (stale slots at the block edges feed only the halo
            chunks' outer rows, which are never stored). Returns a flat
            list of P planes (plane order ``j * F + p``)."""
            prev = (c - 1) % depth
            cur = c % depth
            nxt = (c + 1) % depth

            def streamed(pi, cxj, cyj):
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
                return _lane_roll(rows, cxj, nxE)

            if mf:
                st = [[streamed(j * F + p, lattice.cx[j], lattice.cy[j])
                       for p in range(F)] for j in range(q)]
                if physics == "multifield_expansion":
                    if noisy and not interpret:
                        pltpu.prng_seed(seed_ref[0, 0]
                                        ^ (c * np.int32(-1640531535)
                                           + np.int32(stage * 40503)))

                    def eta_fn(p, shape):
                        if interpret:
                            return _normal_from_hash(
                                seed_ref[0, 0]
                                ^ (c * np.int32(-1640531535)
                                   + np.int32(stage * 40503 + p * 7919)),
                                shape)
                        return _normal_from_bits(shape)

                    res = _mf_expansion_tile(st, omegas, lb_Gs, lb_Dgs,
                                             cutoff, w_ulb, w_vlb, lattice,
                                             eta_fn)
                else:
                    rowid = rowid0 + ((c - 1) * CH + y0)
                    res = _mf_fisher_tile(st, rowid, laneid, ny, nx,
                                          omegas, lb_Gs, w_ulb, w_vlb,
                                          lattice)
                return [res[j][p] for j in range(q) for p in range(F)]

            st = [streamed(j, lattice.cx[j], lattice.cy[j])
                  for j in range(q)]
            if diffusion:
                res = _diffusion_collide(st, w_omega, w_ulb, w_vlb,
                                         w_G if lb_G else 0.0, lattice)
                if noisy:
                    # multiplicative demographic noise + negativity clip
                    # (D2Q9_diffusion.cl:126-167); seed mixes the caller's
                    # per-(sweep, shard) seed with (chunk, stage)
                    rho = st[0]
                    for j in range(1, q):
                        rho = rho + st[j]
                    if lb_Dg:
                        seed = (seed_ref[0, 0]
                                ^ (c * np.int32(-1640531535)
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
                st = _velocity_inlet_tile(st, laneid, nx, w_ulb)
                return _moments_feq_collide(st, None, w_omega, lattice,
                                            incompressible, False)
            rowid = rowid0 + ((c - 1) * CH + y0)
            if BX:
                st = _zou_he_inout_ext(st, rowid, laneid, ny, nx, BX, W,
                                       w_inlet, w_outlet, incompressible)
            else:
                st = _zou_he_inout_narrow(st, rowid, laneid, ny, nx, w_inlet,
                                          w_outlet, incompressible)
            st = _walls_corners_tile(st, rowid, laneid, ny, nx, w_inlet,
                                     w_outlet)
            return _moments_feq_collide(st, None, w_omega, lattice,
                                        incompressible,
                                        zero_vel_in_obstacle=False)

        # prologue: three loads in flight
        load(0)
        load(1)
        load(2)

        def final_stage(c):
            """Last internal step on virtual chunk c + store (body chunks
            only)."""
            src = mids[K - 2] if K >= 2 else in_ring
            depth = _NM if K >= 2 else _NS
            res = chunk_step(src, depth, c, stage=K - 1)

            @pl.when((c >= 1) & (c <= C))
            def _():
                # slot reuse: wait for the store issued _NO chunks ago
                @pl.when(c >= _NO + 1)
                def _():
                    store(c - _NO).wait()

                for pi in range(P):
                    # x-extended tiles store body lanes only
                    out_ring[c % _NO, pi, :, :] = (
                        res[pi][:, BX:BX + W] if BX else res[pi])
                store(c).start()

        def body(k, _):
            @pl.when(k == 0)
            def _():
                load_wait(0)

            @pl.when(k + 1 < V)
            def _():
                load_wait(k + 1)

            if K == 1:
                @pl.when(k < V)
                def _():
                    final_stage(k)
            else:
                # stage 0 (from input ring) on chunk k
                @pl.when(k < V)
                def _():
                    res = chunk_step(in_ring, _NS, k, stage=0)
                    for pi in range(P):
                        mids[0][k % _NM, pi, :, :] = res[pi]

                # intermediate stages s = 1..K-2 on chunk k - s
                for s in range(1, K - 1):
                    @pl.when((k >= s) & (k - s < V))
                    def _(s=s):
                        c = k - s
                        res = chunk_step(mids[s - 1], _NM, c, stage=s)
                        for pi in range(P):
                            mids[s][c % _NM, pi, :, :] = res[pi]

                # final stage on chunk k - (K-1)
                @pl.when((k >= K - 1) & (k - (K - 1) < V))
                def _():
                    final_stage(k - (K - 1))

            @pl.when(k + 3 < V)
            def _():
                load(k + 3)
            return 0

        jax.lax.fori_loop(0, V + K - 1, body, 0)
        if C >= 2:
            store(C - 1).wait()
        store(C).wait()

    scratch = [pltpu.VMEM((_NS, P, CH, nxE), dtype)]
    scratch += [pltpu.VMEM((_NM, P, CH, nxE), dtype) for _ in range(K - 1)]
    scratch += [pltpu.VMEM((_NO, P, CH, W), dtype)]
    scratch += [
        pltpu.SemaphoreType.DMA((_NS,)),
        pltpu.SemaphoreType.DMA((_NO,)),
    ]

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),      # f_loc (x-extended if BX)
        pl.BlockSpec(memory_space=pl.ANY),      # top halo chunk
        pl.BlockSpec(memory_space=pl.ANY),      # bottom halo chunk
        pl.BlockSpec(memory_space=pltpu.SMEM),  # y0
    ]
    if BX:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # x0
    if noisy:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # seed

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, H, W), dtype),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=220 * K * F * H * nxE,
            bytes_accessed=2 * P * H * nxE * 4,
            transcendentals=0,
        ),
    )

    if BX and noisy:
        def stepK(f_loc, top_halo, bot_halo, y0, x0, seed):
            return call(f_loc, top_halo, bot_halo, y0, x0, seed)
    elif BX:
        def stepK(f_loc, top_halo, bot_halo, y0, x0):
            return call(f_loc, top_halo, bot_halo, y0, x0)
    elif noisy:
        def stepK(f_loc, top_halo, bot_halo, y0, seed):
            return call(f_loc, top_halo, bot_halo, y0, seed)
    else:
        def stepK(f_loc, top_halo, bot_halo, y0):
            return call(f_loc, top_halo, bot_halo, y0)

    stepK.chunk = CH
    return stepK
