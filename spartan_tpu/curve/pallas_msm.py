"""Pallas TPU kernel for the windowed row-MSM — the commitment workhorse.

Why a kernel: the XLA formulation of the 4-bit windowed MSM
(curve/msm.py::_msm_rows_win_jit) is structurally HBM-bound — every
tree-sum level materialises a point array, so the algorithm moves
~64 windows x N points x 256 B ~= 16 GB of intermediates per 2^20
points (~20 s at v5e bandwidth) no matter how well XLA fuses.  Keeping
one row-block's whole select+tree-sum in VMEM reduces HBM traffic to
the inputs themselves (~100 MB) and makes the MSM compute-bound:
the speed-of-light for this op on a v5e is set by the VPU's int32
multiply throughput, not by memory.

Layout: limbs on SUBLANES, points on LANES — a field element batch is
``(LB, 16, W)`` (u32 16-bit limbs, little-endian along axis -2), so a
(16, 128)+ tile is fully used; the ``(..., 16)``-limbs-last layout of
the XLA path would waste 7/8 of every vector lane in Mosaic.

Field arithmetic is **lazy pseudo-Mersenne** mod p = 2^255 - 19:
values live in [0, 2^256) (not canonical), products are folded with
2^256 === 38 (mod p) and no conditional subtractions inside the
kernel; outputs are canonicalised by the XLA wrapper.  Subtraction
uses a - b === a + not16(b) + (p - 37) (mod p) — borrow-free.

Algorithm (one grid step = one (lane-block, row-block, window) cell):
  digits d[l,i] = 4-bit window w of scalars[l,i]     (shift+mask)
  sel[l,i]     = tab[d[l,i]][i]                      (4-level binary
                 select tree, arithmetic selects)
  S_wb[l]      = sum_{i in block} sel[l,i]           (halving tree:
                 lo half + pltpu.roll'd hi half per level)
Lane blocks of RC points bound VMEM; the per-(window, lane-block) sums
(64, nblk, L) then reduce over lane blocks and combine with a 16-ary
Horner over windows on the XLA side, which is tiny.

Reference parity: this computes exactly group.rs:98-117's
vartime_multiscalar_mul restricted to our row-batched commitment shape
(dense_mlpoly.rs:148-162); results are byte-identical to
curve/msm.py's other backends (tests/test_pallas_msm.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.field import P25519 as P
from ..ff import limb
from ..ff.limb import NLIMBS

# Edwards curve constant 2*d for the hwcd-3 unified addition
D_EDW = (-121665 * pow(121666, -1, P)) % P
D2_INT = (2 * D_EDW) % P

P_LIMBS = limb.int_to_limbs(P)
D2_LIMBS = limb.int_to_limbs(D2_INT)
PM37_LIMBS = limb.int_to_limbs(P - 37)  # the borrow-free sub constant

# consts block rows (k, H=32): [p, d2, p-37], zero-padded above row 15
_CONSTS = np.pad(
    np.stack([P_LIMBS, D2_LIMBS, PM37_LIMBS], axis=0).astype(np.uint32),
    [(0, 0), (0, limb.NLIMBS)])

_LIMB_MASK = np.uint32(limb.LIMB_MASK)


# ---------------------------------------------------------------------------
# Transposed lazy field ops: limbs along axis -2, lanes along axis -1
#
# MOSAIC LAYOUT RULE: no jnp.pad / jnp.concatenate anywhere.  Mosaic
# lowers pltpu.roll (and slices) to lazy layout *offsets*, and
# tpu.concatenate rejects operands whose offsets disagree on any
# non-concat dim ("result/input offset mismatch") -- the failure mode
# that killed the first compiled version of this kernel.  Elementwise
# ops relayout automatically, so every value here lives at a FIXED
# height of H = 32 sublanes (normal values occupy rows 0..15, wide
# products rows 0..31 -- a product of two < 2^256 values is < 2^512,
# so no 33rd row is ever needed) and limb shifts are roll + iota-mask.
# ---------------------------------------------------------------------------

H = 2 * NLIMBS  # fixed sublane height for every lazy value


_IN_PALLAS = False  # set while tracing the Mosaic kernel body
_LEAN = False  # trace loop-based (compile-lean) kernel bodies


def _roll(x, k, axis):
    """rolled[i] = x[(i - k) % n].  pltpu.roll inside the Pallas trace
    (jnp.roll does not lower in Mosaic); jnp.roll everywhere else
    (pltpu.roll has no lowering outside a Pallas trace) — the lazy
    field ops below are shared with the XLA win_t backend and with
    host-side unit tests."""
    if _IN_PALLAS:
        return pltpu.roll(x, k, axis=axis)
    return jnp.roll(x, k, axis)


def _row_iota(shape):
    return lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 2)


def _rollup(x, k, fill=0):
    """Shift k rows toward higher limb indices along axis -2."""
    if k == 0:
        return x
    r = _roll(x, k, x.ndim - 2)
    return jnp.where(_row_iota(x.shape) >= np.uint32(k), r,
                     jnp.uint32(fill))


def _rolldown(x, k):
    """Shift k rows toward lower limb indices along axis -2 (zero-fill)."""
    if k == 0:
        return x
    n = x.shape[-2]
    r = _roll(x, n - k, x.ndim - 2)
    return jnp.where(_row_iota(x.shape) < np.uint32(n - k), r, jnp.uint32(0))


def _rollup_dyn(x, k):
    """_rollup with a TRACED shift (fori_loop bodies; Mosaic lowers
    pltpu.roll with a dynamic shift to tpu.dynamic_rotate)."""
    k = k.astype(jnp.uint32) if hasattr(k, "astype") else jnp.uint32(k)
    r = pltpu.roll(x, k, axis=x.ndim - 2)
    return jnp.where(_row_iota(x.shape) >= k, r, jnp.uint32(0))


def _rolldown_dyn(x, k):
    """_rolldown with a TRACED shift."""
    n = x.shape[-2]
    k = k.astype(jnp.uint32) if hasattr(k, "astype") else jnp.uint32(k)
    r = pltpu.roll(x, jnp.uint32(n) - k, axis=x.ndim - 2)
    return jnp.where(_row_iota(x.shape) < jnp.uint32(n) - k, r,
                     jnp.uint32(0))


def _carry(acc):
    """Kogge-Stone carry propagation along axis -2 (limbs), u32 limbs
    holding values < 2^32 -> clean 16-bit limbs (height preserved; the
    callers' value-range invariants guarantee no carry out of the top
    row)."""
    d = acc & _LIMB_MASK
    c = acc >> np.uint32(16)
    s = d + _rollup(c, 1)
    g = (s >> np.uint32(16)).astype(jnp.uint32)
    p = (((s & _LIMB_MASK) + 1) >> np.uint32(16)) & 1
    n = s.shape[-2]
    shift = 1
    while shift < n:
        g = g | (p & _rollup(g, shift))
        p = p & _rollup(p, shift, fill=1)
        shift *= 2
    return (s + _rollup(g, 1)) & _LIMB_MASK


def _lo_rows(x):
    """Zero rows >= NLIMBS (keep the canonical 16-limb value rows)."""
    return jnp.where(_row_iota(x.shape) < np.uint32(NLIMBS), x,
                     jnp.uint32(0))


class _FpLazy:
    """Lazy mod-p ops on (..., H, lanes) blocks.  All values in
    [0, 2^256) occupying rows 0..15 (rows 16..31 zero); fold-based
    reduction only (no compares, no cond-sub)."""

    def __init__(self, consts):
        # consts: (3, H) -> broadcast rows to (H, 1) columns
        self.d2 = consts[1][:, None]       # (H, 1) broadcasts over lanes
        self.pm37 = consts[2][:, None]

    @staticmethod
    def mul_wide(a, b):
        """(...,H,W) x (...,H,W) -> (...,H,W) raw product columns (rows
        0..31), carry-propagated to 16-bit limbs.

        Two trace shapes: the unrolled 16-term schoolbook (fastest
        steady-state) and, when _LEAN is set, a fori_loop over the 16
        a-limbs with dynamic rotates — ~16x smaller Mosaic body, which
        is what dominates the kernel's cold-compile time."""
        if _LEAN:
            def body(i, acc):
                ai = _rolldown_dyn(a, i)[..., 0:1, :]  # row i -> row 0
                prod = ai * b  # (...,H,W) exact u32
                return acc + (_rollup_dyn(prod & _LIMB_MASK, i)
                              + _rollup_dyn(prod >> np.uint32(16), i + 1))
            acc = lax.fori_loop(0, NLIMBS, body, jnp.zeros_like(b),
                                unroll=False)
            return _carry(acc)
        acc = None
        for i in range(NLIMBS):
            prod = a[..., i : i + 1, :] * b  # (...,H,W) exact u32
            term = (_rollup(prod & _LIMB_MASK, i)
                    + _rollup(prod >> np.uint32(16), i + 1))
            acc = term if acc is None else acc + term
        return _carry(acc)

    @staticmethod
    def fold(t):
        """(...,H,W) clean 16-bit limbs (any value < 2^512) ->
        (...,H,W) < 2^256 congruent mod p (2^256 === 38), rows 16..31
        zero.  Three-stage like ff/fp25519._fold."""
        lo = _lo_rows(t)
        hi = _rolldown(t, NLIMBS)
        p38 = hi * np.uint32(38)  # limbs < 2^22, exact
        # r = lo + 38*hi < 39 * 2^256: rows 0..16
        acc = lo + (p38 & _LIMB_MASK) + _rollup(p38 >> np.uint32(16), 1)
        r = _carry(acc)  # row 16 < 39, rows 17.. zero
        # fold 2: r2 = r_lo + 38 * r[16]; r2 row 16 is 0 or 1
        hi2 = _rolldown(r, NLIMBS) * np.uint32(38)  # row 0 only, < 2^11
        r2 = _carry(_lo_rows(r) + hi2)
        # fold 3: if row 16 is set (0/1), r2_lo is tiny, +38 is safe
        top38 = _rolldown(r2, NLIMBS) * np.uint32(38)
        return _carry(_lo_rows(r2) + top38)

    def mul(self, a, b):
        return self.fold(self.mul_wide(a, b))

    def add(self, a, b):
        return self.fold(_carry(a + b))

    def sub(self, a, b):
        """a - b mod p, borrow-free: a + not16(b) + (p - 37)."""
        nb = _lo_rows(b ^ _LIMB_MASK)
        pm = jnp.broadcast_to(self.pm37, a.shape)
        return self.fold(_carry(a + nb + pm))

    def dbl(self, a):
        return self.add(a, a)


def _padd(f: _FpLazy, p, q):
    """Unified extended-coords addition (add-2008-hwcd-3), lazy field.
    p, q: 4-tuples (x, y, z, t) of (…,16,W) blocks."""
    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    a = f.mul(f.sub(y1, x1), f.sub(y2, x2))
    b = f.mul(f.add(y1, x1), f.add(y2, x2))
    c = f.mul(f.mul(t1, jnp.broadcast_to(f.d2, t1.shape)), t2)
    d = f.dbl(f.mul(z1, z2))
    e = f.sub(b, a)
    ff = f.sub(d, c)
    g = f.add(d, c)
    h = f.add(b, a)
    return (f.mul(e, ff), f.mul(g, h), f.mul(ff, g), f.mul(e, h))


def _sel_arith(m, a, b):
    """Arithmetic select: m in {0,1} u32 broadcastable -> m?a:b."""
    return b + m * (a - b)  # exact mod 2^32


def _tree_select(d, tabs):
    """4-level binary select: d (…,1,W) digits 0..15; tabs: list of 16
    4-tuples of (16, W) blocks.  Returns one 4-tuple of (…,16,W)."""
    bits = [((d >> np.uint32(k)) & 1) for k in range(4)]
    cur = tabs
    for k in (3, 2, 1, 0):
        half = 1 << k
        m = bits[k]
        cur = [tuple(_sel_arith(m, hi[c], lo[c]) for c in range(4))
               for lo, hi in zip(cur[:half], cur[half:])]
    return cur[0]


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _msm_window_kernel(RC: int, lean: bool,
                       consts_ref, scal_ref, tx_ref, ty_ref, tz_ref, tt_ref,
                       ox_ref, oy_ref, oz_ref, ot_ref):
    """One (lane-block, row-block, window) grid step: select each
    lane's multiple and tree-sum the RC lanes to one point per row.

    scal:  (1, LB, 16, RC) canonical scalar limbs (limbs on sublanes)
    t*_ref: (1, 16, H, RC) multiples table 0..15 (entry, limb, lane)
    o*_ref: (1, LB, 1, 16) one extended-coords point per row (lazy)

    The leading length-1 axis is the lane-block: the wrapper reshapes
    the R lanes to (nblk, RC) and lifts nblk into a leading ARRAY axis,
    so the last two block dims always EQUAL the array dims — that is
    what lets RC be any power of two (Mosaic only accepts trailing
    block dims that are (8,128)-divisible or whole), and RC sets the
    kernel body's vreg footprint, which is what Mosaic compile time
    scales with (measured ladder in PERF.md).

    Mosaic layout rules obeyed throughout: no jnp.pad/concatenate (see
    the field-ops header), no lane slice at a nonzero offset — the
    halving tree reads its high half via pltpu.roll + an offset-0
    slice, and the lane-blocking itself is done by the BlockSpec
    index_map (DMA), not by in-kernel slicing.
    """
    global _IN_PALLAS, _LEAN
    _IN_PALLAS = True  # trace-time scoping; single-threaded tracing
    _LEAN = lean
    try:
        f = _FpLazy(consts_ref[...])
        w = pl.program_id(2)
        limb_idx = w // 4
        sh = (w % 4) * 4

        lm = scal_ref[0, :, pl.ds(limb_idx, 1), :]  # (LB, 1, RC)
        d = (lm >> sh.astype(jnp.uint32)) & np.uint32(15)

        refs = (tx_ref, ty_ref, tz_ref, tt_ref)
        if lean:
            # Select via masked accumulation over the 16 table entries
            # (exact u32 arithmetic: mask in {0,1}); fori_loop keeps
            # ONE entry's worth of ops in the Mosaic body.
            LB = d.shape[0]
            def sel_body(e, acc):
                m = (d == e.astype(jnp.uint32)).astype(jnp.uint32)
                ent = [ref[0, pl.ds(e, 1), :, :] for ref in refs]
                return tuple(a + m * t for a, t in zip(acc, ent))
            zeros = jnp.zeros((LB, H, d.shape[-1]), jnp.uint32)
            p = lax.fori_loop(0, 16, sel_body,
                              (zeros, zeros, zeros, zeros), unroll=False)

            # Halving tree at FIXED width with dynamic rotate: level k
            # adds lane i+RC/2^(k+1) into lane i; lanes >= half carry
            # garbage that never reaches lane 0 (each level only reads
            # below the previous half).
            log2rc = max(RC.bit_length() - 1, 0)
            def tree_body(lvl, p):
                half = jnp.uint32(RC) >> (lvl.astype(jnp.uint32) + 1)
                k = jnp.uint32(RC) - half
                hi = tuple(pltpu.roll(c, k, axis=c.ndim - 1) for c in p)
                return _padd(f, p, hi)
            p = lax.fori_loop(0, log2rc, tree_body, p, unroll=False)
        else:
            tabs = [tuple(ref[0, e, :, :] for ref in refs)
                    for e in range(16)]
            p = _tree_select(d, tabs)  # 4-tuple of (LB, H, RC)

            # Halving tree RC -> 1: lo half + rolled hi half, offset-0.
            width = RC
            while width > 1:
                half = width // 2
                lo = tuple(c[..., :half] for c in p)
                hi = tuple(_roll(c, half, 2)[..., :half] for c in p)
                p = _padd(f, lo, hi)
                width = half

        for ref, c in zip((ox_ref, oy_ref, oz_ref, ot_ref), p):
            ref[...] = c[:, :NLIMBS, 0][None, None, :, :]
    finally:
        _IN_PALLAS = False
        _LEAN = False


@functools.partial(jax.jit,
                   static_argnames=("LB", "RC", "interpret", "lean"))
def _msm_windows_pallas(scal_t: jnp.ndarray, tab,
                        LB: int = 8, RC: int = 256,
                        interpret: bool = False, lean: bool = False):
    """scal_t: (L, 16, R) canonical limbs; tab: 4-tuple of (16, H, R).
    Returns 4-tuple of (64, R // RC, L, 16) lazy per-lane-block window
    sums (limbs last); the XLA wrapper reduces the lane-block axis.

    Grid order (lane-block, row-block, window): window is minor-most so
    the (16, H, RC) table block — the big DMA — is reused across all 64
    windows, and the scalar block across 64 * (L/LB) steps."""
    L, _, R = scal_t.shape
    assert L % LB == 0 and R % RC == 0
    nblk = R // RC
    grid = (nblk, L // LB, 64)

    # Lift the lane-block axis into a leading ARRAY axis so the last
    # two dims of every block EQUAL the array dims — Mosaic accepts
    # only (8,128)-divisible or whole trailing block dims, and this is
    # what makes small RC (the compile-lean configurations) legal for
    # large R.
    scal4 = jnp.moveaxis(scal_t.reshape(L, NLIMBS, nblk, RC), 2, 0)
    tab4 = tuple(jnp.moveaxis(t.reshape(16, H, nblk, RC), 2, 0)
                 for t in tab)

    in_specs = [
        pl.BlockSpec((3, H), lambda b, g, w: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, LB, NLIMBS, RC), lambda b, g, w: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, 16, H, RC), lambda b, g, w: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    out_specs = [
        pl.BlockSpec((1, 1, LB, NLIMBS), lambda b, g, w: (w, b, g, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    out_shape = [jax.ShapeDtypeStruct((64, nblk, L, NLIMBS), jnp.uint32)
                 for _ in range(4)]

    kern = functools.partial(_msm_window_kernel, RC, lean)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(_CONSTS), scal4, *tab4)
    return outs


# ---------------------------------------------------------------------------
# XLA-side wrapper: table build, transpose, Horner combine
# ---------------------------------------------------------------------------

_tab_cache: dict = {}


def _build_tab(gens):
    """16-entry multiples table as 4 arrays (16, H, R): entry v = v*G,
    coords transposed to (limb, lane) and zero-padded from 16 to H=32
    limb rows (the kernel's fixed-height layout; padding here is XLA,
    where pad/concat are unrestricted).  Cached by generator-array
    identity: commitment gens are long-lived module-level objects and
    the 14 chained point adds here are pure overhead on every repeat
    call otherwise."""
    from . import edwards as ed

    key = id(gens.x)
    hit = _tab_cache.get(key)
    if hit is not None and hit[0] is gens.x:
        return hit[1]

    tab = [ed.identity(gens.x.shape[:-1]), gens]
    for v in range(2, 16):
        tab.append(ed.add(tab[v - 1], gens))
    out = []
    for c in range(4):
        t = jnp.stack([jnp.swapaxes(p[c], -1, -2) for p in tab], axis=0)
        out.append(jnp.pad(t, [(0, 0), (0, H - NLIMBS), (0, 0)]))
    _tab_cache[id(gens.x)] = (gens.x, tuple(out))
    return tuple(out)


@jax.jit
def _canonicalize(x):
    """Lazy (<2^256) coordinate -> canonical [0, p) (limbs last)."""
    from ..ff import fp25519 as fp

    return fp.reduce_canonical(x)


@jax.jit
def _msm_tail(wins):
    """Fused post-kernel chain: canonicalize all 4 coords + lane-block
    reduction + Horner window combine in ONE executable.  The axon
    relay charges a fixed ~0.5-0.9 s per executable invocation
    (round-5 measurement: per-round cost is width-independent), so the
    old 6-invocation tail cost ~5 s of pure dispatch at any size."""
    wins = tuple(_canonicalize(c) for c in wins)
    wins = _reduce_laneblocks(wins)
    return _horner_windows(wins)


@jax.jit
def _horner_windows(wins):
    """wins: 4-tuple of (64, L, 16) canonical window sums (LSB-first
    windows).  Returns PointArray (L,): sum_w 16^w * S_w."""
    from . import edwards as ed

    pts = ed.PointArray(*wins)

    def body(acc, i):
        w = 62 - i
        s = ed.PointArray(*(lax.dynamic_index_in_dim(c, w, axis=0,
                                                     keepdims=False)
                            for c in pts))
        acc = ed.double(ed.double(ed.double(ed.double(acc))))
        return ed.add(acc, s), None

    top = ed.PointArray(*(c[63] for c in pts))
    acc, _ = lax.scan(body, top, jnp.arange(63, dtype=jnp.int32))
    return acc


@jax.jit
def _reduce_laneblocks(wins):
    """wins: 4-tuple of (64, nblk, L, 16) canonical window sums ->
    4-tuple of (64, L, 16): point-add tree over the lane-block axis
    (vectorized over all 64*L lanes at once)."""
    from . import edwards as ed

    p = ed.PointArray(*wins)
    nblk = p.x.shape[1]
    while nblk > 1:
        if nblk % 2:
            # odd width: fold the trailing block into block 0 first so
            # the halving below sees matched lo/hi halves (the caller
            # pads to a power of two, but stay correct regardless)
            last = ed.PointArray(*(c[:, nblk - 1:nblk] for c in p))
            head = ed.PointArray(*(c[:, :1] for c in p))
            merged = ed.add(head, last)
            p = ed.PointArray(*(
                jnp.concatenate([mc, c[:, 1:nblk - 1]], axis=1)
                for mc, c in zip(merged, p)))
            nblk -= 1
            continue
        half = nblk // 2
        lo = ed.PointArray(*(c[:, :half] for c in p))
        hi = ed.PointArray(*(c[:, half:] for c in p))
        p = ed.add(lo, hi)
        nblk = half
    return tuple(c[:, 0] for c in p)


# -- RC auto-selection --------------------------------------------------
#
# Cold-compile cost and warm throughput pull RC in opposite directions
# (PERF.md "pallas compile ladder", measured on the v5e): RC=32
# compiles in ~330 s and runs a 2^20 row-MSM in 46.5 s warm (the grid
# pays 262,144 tiny output DMAs); RC=256 compiles in ~785 s and runs
# the same MSM in 0.024 s.  Neither dominates — the right config
# depends on how many times the process will dispatch the shape.
#
#   * warm intent declared (SPARTAN_TPU_EXPECT_REPS > 1, set by the
#     profilers/bench from --reps, or SPARTAN_TPU_SERVING=1): compile
#     the warm-optimal kernel up front; rep 0 absorbs the bill and
#     every later rep runs at kernel speed.
#   * no intent: cold-optimal first (one-shot proves stay at the cheap
#     compile), then a ski-rental upgrade — after _RC_UPGRADE_CALLS
#     dispatches of one shape the cumulated grid overhead rivals the
#     big compile (~16 x 46.5 s ~= 785 s at 2^20), so the shape
#     switches to the warm config: total overhead stays within ~2x of
#     the clairvoyant choice no matter the call count.
_RC_COLD = 32
_RC_WARM = 256
_RC_UPGRADE_CALLS = 16
_rc_calls: dict = {}  # (L, R) -> dispatch count under auto policy


def _warm_intent() -> bool:
    import os

    try:
        if int(os.environ.get("SPARTAN_TPU_EXPECT_REPS", "1") or 1) > 1:
            return True
    except ValueError:
        pass
    return os.environ.get("SPARTAN_TPU_SERVING", "0") == "1"


def _auto_rc(L: int, R: int) -> int:
    import os

    calls = _rc_calls.get((L, R), 0)
    _rc_calls[(L, R)] = calls + 1
    thresh = int(os.environ.get("SPARTAN_TPU_RC_UPGRADE_CALLS",
                                str(_RC_UPGRADE_CALLS)))
    if _warm_intent() or calls >= thresh:
        # warm-optimal is SHAPE-dependent: big grids (R >= 1024) want
        # RC=256 (0.024 s vs 46.5 s warm at 2^20); at small R the grid
        # is short anyway and bigger cells lose on BOTH axes (2^14
        # ladder: RC=32 = 234 s compile / 0.005 s warm vs RC=128 =
        # 472 s / 0.023 s), so the cold config is already optimal.
        return _RC_WARM if R >= 1024 else _RC_COLD
    return _RC_COLD


def msm_rows_pallas(scalars: jnp.ndarray, gens,
                    LB: int | None = None, RC: int | None = None,
                    interpret: bool = False, lean: bool | None = None):
    """out[l] = sum_i scalars[l,i] * gens[i].

    scalars: (L, R, 16) canonical limbs; gens: (R,) PointArray.
    Drop-in equal to msm.msm_rows (same group elements).  LB rows and
    RC lanes per grid step; R is padded with identity points (zero
    scalars select table entry 0 = identity, so padding lanes are
    exact no-ops) to RC * 2^k lanes — a power-of-two lane-block count,
    which _reduce_laneblocks's halving tree requires.

    lean=True traces fori_loop kernel bodies (dynamic rotates) instead
    of the fully unrolled select/halving trees.  MEASURED (v5e, axon
    relay, L=4 R=128): lean compiles in 747 s vs 440 s unrolled —
    Mosaic's dynamic_rotate lowering costs more compile time than the
    unrolled trees save — so the default stays unrolled; the flag is
    kept for future Mosaic versions (SPARTAN_TPU_PALLAS_LEAN=1).
    Outputs are bit-identical (checked vs the host oracle on-chip)."""
    import os

    from . import edwards as ed

    if lean is None:
        lean = os.environ.get("SPARTAN_TPU_PALLAS_LEAN", "0") == "1"
    # Grid-cell shape knobs: LB rows x RC lanes per step.  Mosaic
    # compile time scales with the kernel body's vreg footprint
    # (values are (LB, 32, RC) u32), so smaller cells compile faster
    # at some steady-state cost; see PERF.md "pallas compile ladder".
    if LB is None:
        LB = int(os.environ.get("SPARTAN_TPU_PALLAS_LB", "8"))
    L, R = scalars.shape[0], scalars.shape[1]
    if RC is None:
        rc_env = os.environ.get("SPARTAN_TPU_PALLAS_RC", "auto")
        RC = _auto_rc(L, R) if rc_env == "auto" else int(rc_env)

    # Cap the per-call grid at the proven envelope: the 2^20 NIZK
    # kernel runs 32,768 grid steps / ~0.5 GB of lane-block buffers;
    # the SNARK-2^20 comb shape (4096x4096, 524,288 steps, ~4.3 GB
    # buffers + a 4x bigger tail) CRASHED the TPU worker
    # (artifacts/profile_snark_20_tpu_r5.log, attempt 2).  Larger row
    # counts run as independent row blocks — commitments are
    # row-independent, so outputs concatenate exactly.
    max_grid = int(os.environ.get("SPARTAN_TPU_PALLAS_MAX_GRID", "32768"))
    nblk_est = 1 << max((-(-R // min(RC, max(R, 1))) - 1).bit_length(), 0)
    lb_rows = max(LB, (max_grid * LB) // max(nblk_est * 64, 1))
    lb_rows -= lb_rows % LB
    if L > lb_rows:
        from . import edwards as ed

        outs = [msm_rows_pallas(scalars[i : i + lb_rows], gens,
                                LB=LB, RC=RC, interpret=interpret,
                                lean=lean)
                for i in range(0, L, lb_rows)]
        return ed.PointArray(*(jnp.concatenate(cs, axis=0)
                               for cs in zip(*outs)))
    RC = min(RC, 1 << max((R - 1).bit_length(), 0)) if R > 1 else 1
    # tpu.dynamic_rotate requires lane-aligned (multiple-of-128)
    # shapes; below that the unrolled trees are small anyway.
    lean = bool(lean) and RC % 128 == 0
    nblk_p2 = 1 << max((-(-R // RC) - 1).bit_length(), 0)
    rpad = RC * nblk_p2 - R
    if rpad:
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((L, rpad, 16), jnp.uint32)], axis=1)
        idp = ed.identity((rpad,))
        gens = ed.PointArray(*(
            jnp.concatenate([gc, ic], axis=0) for gc, ic in zip(gens, idp)))
    tab = _build_tab(gens)
    scal_t = jnp.swapaxes(scalars, -1, -2)  # (L, 16, R)
    pad = (-L) % LB
    if pad:
        scal_t = jnp.concatenate(
            [scal_t, jnp.zeros((pad, NLIMBS, R + rpad), jnp.uint32)], axis=0)
    wins = _msm_windows_pallas(scal_t, tab, LB=LB, RC=RC,
                               interpret=interpret, lean=lean)
    out = _msm_tail(wins)
    if pad:
        out = ed.PointArray(*(c[:L] for c in out))
    return out
