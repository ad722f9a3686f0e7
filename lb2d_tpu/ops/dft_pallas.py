"""Pallas 4-step DFT passes — the layout-controlled spectral-solve path.

The XLA matmul-DFT (:mod:`lb2d_tpu.ops.dft`) is correct but layout-bound on
TPU: profiling the 8192^2 screened-gradient solve showed ~15 ms of MXU work
inside a ~57 ms solve, the rest being relayout copies XLA inserts around the
4-step's reshape/dot_general chain (the Bailey factorization is inherently a
corner-turn, and XLA materializes it as multiple exotic-layout copies per
pass).

Here each 1-D DFT pass along **axis 0** is ONE Pallas kernel, tiled over
lanes: a ``[n, TW]`` tile is loaded once, the corner-turns happen in VMEM
(3-D leading-dims transposes — measured supported and bit-exact on the
Mosaic compiler), the three 4-step stages run as batched MXU ``dot_general``
s at ``Precision.HIGHEST``, and the tile is written once. HBM traffic per
pass is exactly read + write; no intermediate spills.

Two MXU-economy layers on top of the plain 4-step (round 4):

1. **Block-diagonal saturation** (:func:`_pack_g`): an ``[f, f] x [f, N]``
   matmul streams the same N columns through the 128x128 systolic array as
   a ``[128, 128] x [128, N]`` one — sub-128 factors waste a ``128/f``
   fraction of the array. Each stage folds ``g = 128 // f`` adjacent batch
   groups into one matmul with ``kron(eye(g), F)``; the folds are row-major
   reshapes, so layouts (and results) are unchanged. Per-pass MXU cycles
   drop from ``(n/n1 + n/n2) * W`` to ``~2 * (n/128) * W`` — 1.5x at
   n = 8192 (64*128), 2x at 4096 (64*64).
2. **Gauss 3-matmul complex product** (:func:`_gauss_consts`): the constant
   side pre-combines ``Fc, Fs-Fc, Fs+Fc`` so each complex stage costs 3 MXU
   matmuls instead of 4 (plus one VPU add on the data side) — 0.75x.

Wall-clock model (validated against round-3 measurements: predicted 32 ms
vs 30.2 measured for the HIGHEST 8192^2 solve): MXU passes, not MACs, are
the cost — which is why a deeper n1*n2*n3 factorization would LOSE (smaller
factors mean more, emptier passes). Together the two layers predict
``30.2 * (128/192) * 0.75 = 15.1 ms`` for that solve.

The screened-gradient solve (reference:
``spectral_poisson/screened_poisson.py:38-89``) becomes 4 kernel passes
(the inter-pass transposes are fused into the x/y passes as ``row_input``
tiles transposed in VMEM) + one elementwise multiplier/mirror/pack stage:

    rho [y, x] --fwd-y (real, half-spectrum)--> Z [ky_h, x]
    Z --fwd-x (complex, row-input)--> X [kx, ky_h]
    multipliers + Hermitian mirror + A+iB packing (lane flips, XLA)
    P [kx, ky] --inv-x--> W [x, ky]
    W --inv-y (row-input)--> xg + i yg [y, x]

Numerics match :func:`lb2d_tpu.ops.dft.screened_gradients_mm` to ~1e-5
relative (same HIGHEST-precision matmuls, same packed-Hermitian inverse);
``mm="bf16x3"`` trades to ~3e-4 for half the MXU passes (23.1 vs 30.2 ms
at 8192^2).

Why the inverse is NOT a further-halvable "full-spectrum" pass (round-5
analysis, cf. RESULTS.md): the A+iB pack already delivers the
inverse-side Hermitian economy — TWO real output fields ride ONE complex
chain, i.e. each field costs half a complex transform, exactly what a
per-field half-spectrum (irfft-style) inverse costs. The solve sits at
its information floor of 3 real-transform-equivalents (1 in: forward
real_input chain; 2 out: the packed inverse chain, measured at 2x the
forward's wall-clock). Splitting the pack to exploit per-field ky-
Hermitianity either doubles the inv-x lane-transforms (separated fields)
or requires an 8192-lane VMEM mirror whose permutation-matmul
realization costs ~45% of the transform it would save (Mosaic has no
``rev`` lowering). The remaining slack is HBM + corner turns, attacked
by fusing stages INTO the passes (``screen=``, ``stack_scale=``) rather
than by shrinking the MXU work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["make_axis0_dft", "supports_pallas_solve", "screened_gradients_pl"]

_PREC = jax.lax.Precision.HIGHEST


def _factor(n: int) -> tuple[int, int] | None:
    """n = n1 * n2 with n1 <= n2, n1 as close to sqrt(n) as possible, both
    >= 8 (sublane-dim safety) and n2 <= 512."""
    n1 = int(np.sqrt(n))
    while n1 >= 8:
        if n % n1 == 0 and n // n1 <= 512:
            return n1, n // n1
        n1 -= 1
    return None


def _consts(n1: int, n2: int, inverse: bool):
    """(F1c, F1s, F2c, F2s, twc, tws) for the 4-step with m = n2*a + b,
    k = c + n1*d. Exact int32 phase products (cf. dft.dft_mats)."""
    n = n1 * n2

    def mats(m):
        k = np.arange(m, dtype=np.int64)
        ang = (2.0 * np.pi / m) * ((np.outer(k, k) % m).astype(np.float32))
        sign = 1.0 if inverse else -1.0
        c = np.cos(ang).astype(np.float32)
        s = (sign * np.sin(ang)).astype(np.float32)
        if inverse:
            c, s = c / m, s / m
        return c, s

    F1c, F1s = mats(n1)
    F2c, F2s = mats(n2)
    b = np.arange(n2, dtype=np.int64)
    c = np.arange(n1, dtype=np.int64)
    ang = (2.0 * np.pi / n) * (np.outer(b, c).astype(np.float32))  # [b, c]
    sign = 1.0 if inverse else -1.0
    twc = np.cos(ang).astype(np.float32)
    tws = (sign * np.sin(ang)).astype(np.float32)
    return F1c, F1s, F2c, F2s, twc, tws


def _pack_g(f: int, batch: int) -> int:
    """MXU saturation factor: fold ``g`` adjacent batch groups into one
    matmul via a block-diagonal factor matrix so the contract dim is as
    close to 128 as possible. A ``[f, f] x [f, N]`` matmul costs the same
    MXU passes as ``[128, 128] x [128, N]`` (the systolic array is streamed
    column-wise regardless of how few of its rows are live), so a stage
    with factor f < 128 wastes a 128/f fraction of the array; packing
    recovers it. g must divide the batch count (layout-free fold)."""
    g = max(1, 128 // f)
    while batch % g:
        g -= 1
    return g


def _gauss_consts(Fc: np.ndarray, Fs: np.ndarray):
    """Pre-combined constants for the 3-matmul complex product
    (F = Fc + i Fs, T = Tr + i Ti):

        t1 = Fc (Tr + Ti);  t2 = (Fs - Fc) Tr;  t3 = (Fs + Fc) Ti
        Cr = t1 - t3;       Ci = t1 + t2

    — 3 MXU matmuls instead of 4, with the operand combinations folded
    into the constant side (one VPU add on the data side)."""
    return Fc, Fs - Fc, Fs + Fc


def make_axis0_dft(n: int, W: int, *, real_input: bool = False,
                   inverse: bool = False, out_rows: int | None = None,
                   tw: int = 256, interpret: bool = False,
                   row_input: bool = False, mm: str = "highest",
                   screen: tuple | None = None,
                   stack_scale: float | None = None):
    """Build a 1-D DFT along axis 0 of ``[n, W]`` as one Pallas kernel.

    Returns ``fn(xr[, xi]) -> (yr, yi)`` with ``yr/yi`` of shape
    ``[R, W]`` where ``R = ceil(out_rows / n1) * n1`` rows in k-order
    (``R = n`` when ``out_rows`` is None); callers slice ``[:out_rows]``.
    ``real_input`` drops the imaginary input (2 instead of 4 matmuls in
    step 1). 4-step: m = n2*a + b, k = c + n1*d.

    ``row_input``: the inputs are given TRANSPOSED, ``[W, n]``, and each
    ``[tw, n]`` row tile is transposed in VMEM — this fuses the XLA 2-D
    transpose between solve passes into the kernel (one HBM round trip of
    the transposed intermediate saved per plane).

    ``mm``: matmul mode. ``"highest"`` = ``Precision.HIGHEST`` (bf16x6
    fp32 emulation); ``"bf16x3"`` = manual 3-pass split-bf16 emulation
    (``A_hi B_hi + A_hi B_lo + A_lo B_hi``, f32 accumulation) — half the
    MXU passes, ~2-4x the rounding error (Mosaic has no ``Precision.HIGH``
    lowering, so the split is done by hand).

    ``screen = (ny, lam2)``: fuse the screened-gradient multiplier +
    Hermitian mirror + A+iB pack stage (``screened_gradients_pl`` step 3)
    into this (inverse, complex) pass as an in-VMEM prologue. The inputs
    become the HALF-spectrum planes ``X[r,i]`` of shape ``[n, hp]``
    (``hp = _hpad(ny, ...)``); ``W`` must equal ``ny``. Each output lane
    tile reads its direct tile plus the two input tiles holding the
    Hermitian-mirrored lanes (BlockSpec index maps), the screening
    multipliers are rebuilt from iota (the standard ``fftfreq*n`` grids
    with Nyquist-zeroed gradients — no multiplier arrays cross HBM), and
    the kx mirror is a sublane flip. Kills the separate XLA mult stage
    (measured 5.1 ms of a 28 ms 8192^2 solve) and the packed-spectrum HBM
    round trip.

    ``stack_scale = s``: instead of two ``[R, W]`` outputs, the kernel
    writes ONE ``[2, R, W]`` array ``(s*yr, s*yi)`` — the scale and the
    stack happen at the kernel's output write. This is the final solve
    pass's hand-off shape for the mc engine's external-force planes
    (``ext[2, ny, nx] = amplitude * (xg, yg)``), killing the separate XLA
    multiply+stack pass (~2 full-plane HBM round trips, ~1.8 ms of the
    8192^2 config-5 step). Complex non-screen passes only.
    """
    fac = _factor(n)
    assert fac is not None, f"no 4-step factorization for n={n}"
    n1, n2 = fac
    if n >= 4096:
        tw = min(tw, 128)   # [n, tw] tiles: keep the VMEM working set sane
        # (tw=256 at 8192 was tried: the Mosaic compile exceeds VMEM)
    while W % tw:
        tw //= 2
    assert tw >= 128, (W, tw)
    D = n2 if out_rows is None else (out_rows - 1) // n1 + 1
    R = D * n1
    F1c, F1s, F2c, F2s, twc, tws = _consts(n1, n2, inverse)
    # MXU saturation: block-diagonal packing of g adjacent batch groups
    # per stage (see _pack_g). The folds are row-major reshapes — the
    # packed stages produce bit-identical layouts to the unpacked ones.
    g1 = _pack_g(n1, n2)
    g2 = _pack_g(n2, n1)
    B1, B2 = n2 // g1, n1 // g2
    pack = lambda g, M: np.kron(np.eye(g, dtype=np.float32), M)
    if real_input:
        s1 = (pack(g1, F1c), pack(g1, F1s))      # 2 real matmuls
    else:
        s1 = tuple(pack(g1, M) for M in _gauss_consts(F1c, F1s))
    s2 = tuple(pack(g2, M) for M in _gauss_consts(F2c[:D], F2s[:D]))
    n_s1 = len(s1)
    consts = [jnp.asarray(a) for a in (*s1, *s2, twc, tws)]

    if mm == "bf16x3":
        def dg(A, B, dimension_numbers):
            d = partial(jax.lax.dot_general,
                        preferred_element_type=jnp.float32,
                        dimension_numbers=dimension_numbers)
            Ah = A.astype(jnp.bfloat16)
            Al = (A - Ah.astype(jnp.float32)).astype(jnp.bfloat16)
            Bh = B.astype(jnp.bfloat16)
            Bl = (B - Bh.astype(jnp.float32)).astype(jnp.bfloat16)
            return d(Ah, Bh) + d(Ah, Bl) + d(Al, Bh)
    else:
        dg = partial(jax.lax.dot_general,
                     preferred_element_type=jnp.float32, precision=_PREC)

    def tile_body(xr_t, xi_t, s1a, s1b, s1c, s2a, s2b, s2c, twc_r, tws_r,
                  or_ref, oi_ref, post=None):
        """The in-VMEM 4-step on one loaded [n, tw] tile pair; writes the
        [R, tw] k-order outputs (through ``post(yr, yi)`` if given).
        Shared by the plain pass kernel and the fused screen/mirror
        inverse kernel (``screen=``)."""
        # [n, TW] -> [a, b, w] (free: leading-dim split) -> [b, a, w]
        tr = jnp.transpose(xr_t.reshape(n1, n2, tw), (1, 0, 2))
        ti = (None if xi_t is None else
              jnp.transpose(xi_t.reshape(n1, n2, tw), (1, 0, 2)))
        bdg = lambda A, B: dg(A, B, dimension_numbers=(((2,), (1,)),
                                                       ((0,), (0,))))
        # step 1: inner DFT over a, batched over b (g1-packed):
        # T1[b, c, w] = sum_a F1[c, a] t[b, a, w]
        bc1 = lambda M: jnp.broadcast_to(M[:], (B1, g1 * n1, g1 * n1))
        f1 = lambda t: t.reshape(B1, g1 * n1, tw)
        un1 = lambda t: t.reshape(n2, n1, tw)
        if ti is None:
            t1r = un1(bdg(bc1(s1a), f1(tr)))
            t1i = un1(bdg(bc1(s1b), f1(tr)))
        else:
            # Gauss 3-matmul: t1 = Fc(Tr+Ti), t2 = (Fs-Fc)Tr, t3 = (Fs+Fc)Ti
            trf, tif = f1(tr), f1(ti)
            k1 = bdg(bc1(s1a), trf + tif)
            k2 = bdg(bc1(s1b), trf)
            k3 = bdg(bc1(s1c), tif)
            t1r = un1(k1 - k3)
            t1i = un1(k1 + k2)
        # step 2: twiddle W_n^{+-bc}. (Folding this into per-batch stage-1
        # constants F1tw[b] = tw[b,:]*F1 was tried: it saves only ~1% wall
        # — the pass is HBM-pipeline-bound, not VPU-bound — while baking
        # 3x[B1,128,128] fp32 constants per kernel (~46 MB/solve) into the
        # serialized module, which overflows remote-compile body limits.)
        wc = twc_r[:].reshape(n2, n1, 1)
        ws = tws_r[:].reshape(n2, n1, 1)
        t2r = t1r * wc - t1i * ws
        t2i = t1r * ws + t1i * wc
        # step 3: outer DFT over b, batched over c (g2-packed, Gauss):
        # X[c, d, w] = sum_b F2[d, b] T2[b, c, w]
        ur = jnp.transpose(t2r, (1, 0, 2))      # [c, b, w]
        ui = jnp.transpose(t2i, (1, 0, 2))
        bc2 = lambda M: jnp.broadcast_to(M[:], (B2, g2 * D, g2 * n2))
        f2 = lambda t: t.reshape(B2, g2 * n2, tw)
        urf, uif = f2(ur), f2(ui)
        m1 = bdg(bc2(s2a), urf + uif)
        m2 = bdg(bc2(s2b), urf)
        m3 = bdg(bc2(s2c), uif)
        xr_ = (m1 - m3).reshape(n1, D, tw)       # [c, d, w]
        xi_ = (m1 + m2).reshape(n1, D, tw)
        # k = c + n1*d -> rows [d, c, w] flatten to k-order
        yr = jnp.transpose(xr_, (1, 0, 2)).reshape(R, tw)
        yi = jnp.transpose(xi_, (1, 0, 2)).reshape(R, tw)
        if post is not None:
            yr, yi = post(yr, yi)
        if oi_ref is None:           # stacked scaled output [2, R, tw]
            s = np.float32(stack_scale)
            or_ref[0] = yr * s
            or_ref[1] = yi * s
        else:
            or_ref[:] = yr
            oi_ref[:] = yi

    if screen is not None:
        assert inverse and not real_input and not row_input
        s_ny, s_lam2 = screen
        s_ny, s_lam2 = int(s_ny), float(s_lam2)
        assert W == s_ny, (W, s_ny)
        s_hy = s_ny // 2 + 1
        s_hp = _hpad(s_ny, _factor(s_ny)[0])
        while s_hp % tw:            # mirror maps need tw | hp (and tw | W,
            tw //= 2                # ensured above); both are 128-multiples
        assert tw >= 128, (s_hp, W, tw)
        Tin = s_hp // tw
        Tmir = s_ny // tw           # mirror base: lane m = (Tmir - j)*tw - l
        # Input-stream dedup (round 5): output tile j uses the direct tile
        # only on head lanes (ky <= ny/2, i.e. j <= Tmir/2) and the mirror
        # tiles only on tail lanes (j >= Tmir/2) — the roles only coexist
        # in the straddle tile j = Tmir/2, where direct == mir_a == j.
        # When Tmir is even, one slot (min(j, Tmir-j)) therefore serves
        # both roles and the kernel fetches 4 streams instead of 6 —
        # cutting the pass's input HBM traffic from 3x to 2x the logical
        # half-spectrum (~0.9 ms at 8192^2). Odd Tmir (ny not a multiple
        # of 2*tw) keeps the 3-slot form. LB2D_DFT_NO_DEDUP=1 forces the
        # 3-slot form everywhere (same-session A/B measurement control).
        import os as _os
        s_dedup = (Tmir % 2 == 0
                   and not _os.environ.get("LB2D_DFT_NO_DEDUP"))

    def _screen_prologue(j, xrd, xid, xra, xia, xrb, xib):
        """(Zr, Zi, head) for output lane tile j from the direct and
        mirrored half-spectrum tiles — screened-gradient multipliers +
        Hermitian lane mirror + A+iB pack, all in VMEM/MXU. Mosaic has no
        ``rev`` lowering, so the two mirrors are realized without flips:

        * lane mirror: two exact permutation matmuls (0/1 matrices from
          iota; exact through the split-bf16 paths since 1.0 is exact and
          the hi+lo splits recover f32);
        * row mirror (kx -> -kx): not performed at all — instead the tail
          lanes carry conj(Q) and the caller negates their imaginary
          output, using inv(mirror_rows(Q)) = conj(inv(conj(Q))).
        """
        two_pi = np.float32(2.0 * np.pi)
        lam2f = np.float32(s_lam2)
        half_n = n // 2
        r = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        kx2 = jnp.square(jnp.minimum(r, n - r).astype(jnp.float32))
        gxv = jnp.where(r < half_n, r, jnp.where(r == half_n, 0, r - n)
                        ).astype(jnp.float32)
        l = jax.lax.broadcasted_iota(jnp.int32, (1, tw), 1)
        ky = j * tw + l
        head = ky < s_hy
        # direct (head) lanes: ky <= ny/2; gy Nyquist-zeroed
        ky_f = ky.astype(jnp.float32)
        gy_d = jnp.where(ky == s_ny // 2, 0.0, ky_f)
        s_d = 1.0 / (lam2f * (kx2 + ky_f * ky_f) + 1.0)
        ax_d = two_pi * gxv * s_d
        ay_d = two_pi * gy_d * s_d
        pr = -(ax_d * xid + ay_d * xrd)
        pi = ax_d * xrd - ay_d * xid
        # mirrored (tail) lanes: m = ny - ky = (Tmir - j)*tw - l; lane 0
        # comes from mirror tile A (lane 0), lanes 1.. from the lane
        # reversal of mirror tile B (lanes tw-1 .. 1). E0/S are 0/1
        # permutation matrices built from iota.
        ri = jax.lax.broadcasted_iota(jnp.int32, (tw, tw), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (tw, tw), 1)
        E0 = ((ri == 0) & (ci == 0)).astype(jnp.float32)
        S = (ri + ci == tw).astype(jnp.float32)   # col l>=1 <- row tw-l
        mdims = (((1,), (0,)), ((), ()))

        def mir(a, b):
            return dg(a, E0, dimension_numbers=mdims) + dg(
                b, S, dimension_numbers=mdims)
        xrm, xim = mir(xra, xrb), mir(xia, xib)
        m = (Tmir - j) * tw - l
        m_f = m.astype(jnp.float32)         # m in [1, hy-2]: no Nyquist
        s_m = 1.0 / (lam2f * (kx2 + m_f * m_f) + 1.0)
        ax_m = two_pi * gxv * s_m
        ay_m = two_pi * m_f * s_m
        qr = ay_m * xrm - ax_m * xim
        qi = -(ax_m * xrm + ay_m * xim)
        # tail lanes: conj(Q); the imaginary OUTPUT is negated in post
        return (jnp.where(head, pr, qr),
                jnp.where(head, pi, -qi),
                head)

    def kernel(*refs):
        if screen is not None:
            if s_dedup:
                (xra, xia, xrb, xib,
                 s1a, s1b, s1c, s2a, s2b, s2c, twc_r, tws_r,
                 or_ref, oi_ref) = refs
                xrd, xid = xra, xia   # slot A carries the direct role too
            else:
                (xrd, xid, xra, xia, xrb, xib,
                 s1a, s1b, s1c, s2a, s2b, s2c, twc_r, tws_r,
                 or_ref, oi_ref) = refs
            j = pl.program_id(0)
            zr, zi, head = _screen_prologue(j, xrd[:], xid[:], xra[:],
                                            xia[:], xrb[:], xib[:])
            post = lambda yr, yi: (yr, jnp.where(head, yi, -yi))
            tile_body(zr, zi, s1a, s1b, s1c,
                      s2a, s2b, s2c, twc_r, tws_r, or_ref, oi_ref,
                      post=post)
            return
        if real_input:
            (xr_ref, s1a, s1b, s2a, s2b, s2c, twc_r, tws_r,
             or_ref, oi_ref) = refs
            xi_ref = s1c = None
        elif stack_scale is not None:
            (xr_ref, xi_ref, s1a, s1b, s1c, s2a, s2b, s2c, twc_r, tws_r,
             or_ref) = refs
            oi_ref = None
        else:
            (xr_ref, xi_ref, s1a, s1b, s1c, s2a, s2b, s2c, twc_r, tws_r,
             or_ref, oi_ref) = refs

        def load(ref):
            if ref is None:
                return None
            if row_input:   # [tw, n] tile -> [n, tw] in VMEM
                return jnp.transpose(ref[:], (1, 0))
            return ref[:]

        tile_body(load(xr_ref), load(xi_ref), s1a, s1b, s1c,
                  s2a, s2b, s2c, twc_r, tws_r, or_ref, oi_ref)

    grid = (W // tw,)
    col = lambda i: (0, i)
    row = lambda i: (i, 0)
    full = lambda i: (0, 0)
    if screen is not None:
        # direct tile + the two tiles holding the mirrored lanes (clamped
        # in range; out-of-role lanes are masked in the prologue)
        mir_b = lambda i: (0, jnp.clip(Tmir - i - 1, 0, Tin - 1))
        if s_dedup:
            slot_a = lambda i: (0, jnp.minimum(jnp.minimum(i, Tmir - i),
                                               Tin - 1))
            maps = (slot_a, slot_a, mir_b, mir_b)
        else:
            direct = lambda i: (0, jnp.minimum(i, Tin - 1))
            mir_a = lambda i: (0, jnp.clip(Tmir - i, 0, Tin - 1))
            maps = (direct, direct, mir_a, mir_a, mir_b, mir_b)
        in_specs = [pl.BlockSpec((n, tw), m) for m in maps]
    elif row_input:
        in_specs = [pl.BlockSpec((tw, n), row)] * (1 if real_input else 2)
    else:
        in_specs = [pl.BlockSpec((n, tw), col)] * (1 if real_input else 2)
    in_specs += [pl.BlockSpec((g1 * n1, g1 * n1), full)] * n_s1
    in_specs += [pl.BlockSpec((g2 * D, g2 * n2), full)] * 3
    in_specs += [pl.BlockSpec((n2, n1), full)] * 2
    from jax.experimental.pallas import tpu as pltpu

    if stack_scale is not None:
        assert not real_input and screen is None
        out_specs = [pl.BlockSpec((2, R, tw), lambda i: (0, 0, i))]
        out_shape = [jax.ShapeDtypeStruct((2, R, W), jnp.float32)]
    else:
        out_specs = [pl.BlockSpec((R, tw), col)] * 2
        out_shape = [jax.ShapeDtypeStruct((R, W), jnp.float32)] * 2
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * W * (n_s1 * n * n1 * g1 + 3 * n1 * D * n2 * g2),
            bytes_accessed=(2 * n + 2 * R) * W * 4,
            transcendentals=0,
        ),
    )

    if screen is not None:
        if s_dedup:
            return lambda xr, xi: tuple(call(xr, xi, xr, xi, *consts))
        return lambda xr, xi: tuple(call(xr, xi, xr, xi, xr, xi, *consts))
    if real_input:
        return lambda xr: tuple(call(xr, *consts))
    if stack_scale is not None:
        return lambda xr, xi: call(xr, xi, *consts)[0]
    return lambda xr, xi: tuple(call(xr, xi, *consts))


def supports_pallas_solve(ny: int, nx: int) -> bool:
    """The Pallas solve needs even ny, 4-step factorizations for both
    axes, and lane counts that tile to >= 128 (DMA-aligned columns)."""
    if ny % 2 or nx % 128 or ny % 128:
        return False
    return _factor(ny) is not None and _factor(nx) is not None


def _hpad(ny: int, n1: int) -> int:
    """Half-spectrum row count, rounded up to a multiple of 128 so the
    transposed x-pass gets >= 128-lane tiles (n1 is a divisor of 128 for
    every supported n, so the fwd-y kernel's R = ceil/n1 rows equals this
    exactly)."""
    hy = ny // 2 + 1
    return min(-(-hy // 128) * 128, ny)


def screened_gradients_pl(rho, fx, fy, gx, gy, lam2, interpret: bool = False,
                          mm: str = "highest", fused: bool = True,
                          out_scale: float | None = None):
    """Drop-in Pallas replacement for
    :func:`lb2d_tpu.ops.dft.screened_gradients_mm` (same signature and
    semantics: screened-Poisson spectral gradients of a REAL field,
    Nyquist-zeroed multipliers, packed A+iB inverse).

    ``fused=True`` (default) runs the multiplier/mirror/pack stage inside
    the inverse-x Pallas kernel (``make_axis0_dft(screen=...)``) — the
    multipliers are rebuilt in-kernel from the STANDARD spectral grids
    (``f* = fftfreq(n)*n``, ``g*`` the same with the Nyquist bin zeroed),
    which is exactly what every caller passes. The (concrete,
    trace-time) ``fx/fy/gx/gy`` arguments are checked against those
    standard grids and any mismatch falls back to the array-driven
    ``fused=False`` path, so non-standard multipliers stay correct
    (parity vs ``screened_gradients_mm`` is pinned by test_dft_pallas).
    ``lam2`` must be a concrete (non-traced) scalar here — it is baked
    into the kernel.

    ``out_scale = s``: return ONE stacked array ``[2, ny, nx] =
    (s*xg, s*yg)`` with the scale and stack fused into the inverse-y
    kernel's output write (``stack_scale``) — the mc engine's
    external-force hand-off, killing its XLA multiply+stack pass.
    """
    ny, nx = rho.shape
    assert supports_pallas_solve(ny, nx), (ny, nx)
    hy = ny // 2 + 1
    n1y, _ = _factor(ny)
    hp = _hpad(ny, n1y)

    # 1. forward along y: real input, half spectrum (+ pad rows to a
    #    multiple of n1; sliced away before the mirror)
    fwd_y = make_axis0_dft(ny, nx, real_input=True, out_rows=hp,
                           interpret=interpret, mm=mm)
    Zr, Zi = fwd_y(rho)
    Zr, Zi = Zr[:hp], Zi[:hp]
    # 2. forward along x (complex); the inter-pass transpose is fused into
    #    the kernel (row_input: [tw, nx] tiles transposed in VMEM)
    fwd_x = make_axis0_dft(nx, hp, real_input=False, interpret=interpret,
                           row_input=True, mm=mm)
    Xr, Xi = fwd_x(Zr, Zi)                       # [kx, ky_h]

    if fused:
        # The fused kernel rebuilds the multipliers in-kernel from the
        # STANDARD spectral grids; verify the caller's (concrete) grids
        # actually are those, and quietly take the array-driven path if
        # not (advisor r4, low: silent wrong gradients otherwise).
        def _std(n):
            fr = np.fft.fftfreq(n) * n
            gr = fr.copy()
            gr[n // 2] = 0.0
            return fr, gr
        sfx, sgx = _std(nx)
        sfy, sgy = _std(ny)
        std = (np.allclose(np.asarray(fx), sfx)
               and np.allclose(np.asarray(gx), sgx)
               and np.allclose(np.asarray(fy), sfy)
               and np.allclose(np.asarray(gy), sgy))
        fused = bool(std)
    if fused:
        # 3+4 fused: screening multipliers + Hermitian mirror + A+iB pack
        # as the inverse-x kernel's VMEM prologue
        inv_x = make_axis0_dft(nx, ny, real_input=False, inverse=True,
                               interpret=interpret, mm=mm,
                               screen=(ny, float(lam2)))
        Wr, Wi = inv_x(Xr, Xi)
        inv_y = make_axis0_dft(ny, nx, real_input=False, inverse=True,
                               interpret=interpret, row_input=True, mm=mm,
                               stack_scale=out_scale)
        return inv_y(Wr, Wi)
    # 3. screening + gradient multipliers + Hermitian mirror + A+iB pack,
    #    in the transposed layout (kx rows, ky lanes). Head lanes
    #    ky = 0..ny/2 hold P = A + iB; tail lanes ky' > ny/2 hold
    #    conj(A)(-k) + i conj(B)(-k) = Q at mirrored coordinates
    #    (rows kx -> -kx, lanes ky' -> ny - ky'). Cf. dft.py's
    #    screened_gradients_mm stage 3+4 (row/lane roles swapped).
    KX = fx[:, None]                              # [kx, 1]
    KY = fy[None, :hp]                            # [1, ky_h]
    s = 1.0 / (lam2 * (KX * KX + KY * KY) + 1.0)
    ax = (2.0 * np.pi) * gx[:, None] * s          # [kx, ky_h]
    ay = (2.0 * np.pi) * gy[None, :hp] * s
    axXr, axXi = ax * Xr, ax * Xi
    ayXr, ayXi = ay * Xr, ay * Xi
    Pr_h = -(axXi + ayXr)
    Pi_h = axXr - ayXi
    Qr = ayXr - axXi
    Qi = -(axXr + ayXi)

    def mirror_rows(a):                           # kx -> (-kx) mod nx
        return jnp.concatenate([a[:1], jnp.flip(a[1:], axis=0)], axis=0)

    def tail(q):                                  # lanes ny-hy .. down to 1
        return mirror_rows(jnp.flip(q[:, 1:ny - hy + 1], axis=1))

    Pr = jnp.concatenate([Pr_h[:, :hy], tail(Qr)], axis=1)   # [kx, ky]
    Pi = jnp.concatenate([Pi_h[:, :hy], tail(Qi)], axis=1)
    # 4. inverse along x (rows): [kx, ky] -> [x, ky]
    inv_x = make_axis0_dft(nx, ny, real_input=False, inverse=True,
                           interpret=interpret, mm=mm)
    Wr, Wi = inv_x(Pr, Pi)
    # 5. inverse along y (transpose fused as in step 2) -> xg + i yg [y, x]
    inv_y = make_axis0_dft(ny, nx, real_input=False, inverse=True,
                           interpret=interpret, row_input=True, mm=mm,
                           stack_scale=out_scale)
    if out_scale is not None:
        return inv_y(Wr, Wi)
    Gr, Gi = inv_y(Wr, Wi)
    return Gr, Gi
