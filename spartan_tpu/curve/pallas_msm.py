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

Algorithm (one grid step = one (row-block, window) pair):
  digits d[l,i] = 4-bit window w of scalars[l,i]     (shift+mask)
  sel[l,i]     = tab[d[l,i]][i]                      (4-level select
                 tree evaluated per lane-half to bound VMEM)
  S_w[l]       = sum_i sel[l,i]                      (halving tree:
                 unrolled while wide, masked dynamic-roll loop when
                 narrow — lane tiles below 128 cost the same anyway)
The per-window sums (64, L) then combine on the XLA side with a
16-ary Horner over windows (msm.py::horner_windows), which is tiny.

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

# consts block rows (k, 16): [p, d2, p-37]
_CONSTS = np.stack([P_LIMBS, D2_LIMBS, PM37_LIMBS], axis=0).astype(np.uint32)

_LIMB_MASK = np.uint32(limb.LIMB_MASK)


# ---------------------------------------------------------------------------
# Transposed lazy field ops: limbs along axis -2, lanes along axis -1
# ---------------------------------------------------------------------------

def _shiftl(x, k, axis=-2, fill=0):
    """Shift k positions toward higher limbs along the limb axis."""
    if k == 0:
        return x
    nd = x.ndim
    ax = axis % nd
    pad = [(0, 0)] * nd
    pad[ax] = (k, 0)
    sl = [slice(None)] * nd
    sl[ax] = slice(0, x.shape[ax] - k)
    return jnp.pad(x[tuple(sl)], pad, constant_values=fill)


def _carry(acc):
    """Kogge-Stone carry propagation along axis -2 (limbs), u32 limbs
    holding values < 2^32 -> clean 16-bit limbs (top carry must fit —
    callers size buffers)."""
    d = acc & _LIMB_MASK
    c = acc >> np.uint32(16)
    s = d + _shiftl(c, 1)
    g = (s >> np.uint32(16)).astype(jnp.uint32)
    p = (((s & _LIMB_MASK) + 1) >> np.uint32(16)) & 1
    n = s.shape[-2]
    shift = 1
    while shift < n:
        g = g | (p & _shiftl(g, shift, fill=0))
        p = p & _shiftl(p, shift, fill=1)
        shift *= 2
    return (s + _shiftl(g, 1)) & _LIMB_MASK


def _pad_rows(x, left, total):
    """Place x at limb offset `left` in a width-`total` limb buffer."""
    pad = [(0, 0)] * x.ndim
    pad[-2] = (left, total - left - x.shape[-2])
    return jnp.pad(x, pad)


class _FpLazy:
    """Lazy mod-p ops on (…, limbs, lanes) blocks.  All values in
    [0, 2^256); fold-based reduction only (no compares, no cond-sub)."""

    def __init__(self, consts):
        # consts: (3, 16) -> broadcast rows to (16, 1) columns
        self.d2 = consts[1][:, None]       # (16, 1) broadcasts over lanes
        self.pm37 = consts[2][:, None]

    @staticmethod
    def mul_wide(a, b):
        """(…,16,W) x (…,16,W) -> (…,33,W) raw product columns,
        carry-propagated to 16-bit limbs."""
        total = 2 * NLIMBS + 1
        acc = None
        for i in range(NLIMBS):
            prod = a[..., i : i + 1, :] * b  # (…,16,W) exact u32
            term = (_pad_rows(prod & _LIMB_MASK, i, total)
                    + _pad_rows(prod >> np.uint32(16), i + 1, total))
            acc = term if acc is None else acc + term
        return _carry(acc)

    @staticmethod
    def fold(t):
        """(…,17..33 limbs,W) clean 16-bit limbs -> (…,16,W) < 2^256
        congruent mod p (2^256 === 38).  Three-stage like
        ff/fp25519._fold; limb 32 of a 33-limb product is always zero
        (product of two < 2^256 values), so hi is at most 16 limbs."""
        nh = min(t.shape[-2] - NLIMBS, NLIMBS)
        lo = t[..., :NLIMBS, :]
        hi = t[..., NLIMBS : NLIMBS + nh, :]
        p38 = hi * np.uint32(38)  # limbs < 2^22, exact
        # r = lo + 38*hi < 39 * 2^256: 17 limbs
        acc = (_pad_rows(lo, 0, NLIMBS + 1)
               + _pad_rows(p38 & _LIMB_MASK, 0, NLIMBS + 1)
               + _pad_rows(p38 >> np.uint32(16), 1, NLIMBS + 1))
        r = _carry(acc)  # (…,17,W); limb 16 < 39
        # fold 2: r2 = r_lo + 38 * r[16], 17 limbs again
        hi2 = r[..., NLIMBS : NLIMBS + 1, :] * np.uint32(38)
        r2 = _carry(_pad_rows(r[..., :NLIMBS, :], 0, NLIMBS + 1)
                    + _pad_rows(hi2, 0, NLIMBS + 1))
        # fold 3: if limb 16 is now set (0/1), r2_lo is tiny, +38 is safe
        top38 = r2[..., NLIMBS : NLIMBS + 1, :] * np.uint32(38)
        return _carry(r2[..., :NLIMBS, :] + _pad_rows(top38, 0, NLIMBS))

    def mul(self, a, b):
        return self.fold(self.mul_wide(a, b))

    def add(self, a, b):
        t = _carry(_pad_rows(a, 0, NLIMBS + 1) + _pad_rows(b, 0, NLIMBS + 1))
        return self.fold(t)

    def sub(self, a, b):
        """a - b mod p, borrow-free: a + not16(b) + (p - 37)."""
        nb = b ^ _LIMB_MASK
        t = _carry(_pad_rows(a, 0, NLIMBS + 1) + _pad_rows(nb, 0, NLIMBS + 1)
                   + _pad_rows(jnp.broadcast_to(self.pm37, a.shape), 0,
                               NLIMBS + 1))
        return self.fold(t)

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

def _msm_window_kernel(R: int, n_unroll: int,
                       consts_ref, scal_ref, tx_ref, ty_ref, tz_ref, tt_ref,
                       ox_ref, oy_ref, oz_ref, ot_ref):
    """One (row-block, window) grid step: select each lane's multiple
    and tree-sum the lanes.

    scal:  (LB, 16, R) canonical scalar limbs (limbs on sublanes)
    t*_ref: (16, 16, R) multiples table 0..15 (entry, limb, lane)
    o*_ref: (LB, 16) one extended-coords point per row (lazy coords)
    """
    f = _FpLazy(consts_ref[...])
    w = pl.program_id(1)
    limb_idx = w // 4
    sh = (w % 4) * 4

    lm = scal_ref[:, pl.ds(limb_idx, 1), :]  # (LB, 1, R)
    d = (lm >> sh.astype(jnp.uint32)) & np.uint32(15)

    # Per-lane-half select tree (halves bound peak VMEM), then the
    # first tree-sum level is the add of the two halves.
    def half_sel(lo, hi):
        tabs = [tuple(ref[e, :, lo:hi] for ref in (tx_ref, ty_ref,
                                                   tz_ref, tt_ref))
                for e in range(16)]
        return _tree_select(d[..., lo:hi], tabs)

    if R == 1:
        p = half_sel(0, 1)
    else:
        p = _padd(f, half_sel(0, R // 2), half_sel(R // 2, R))

    # Unrolled halving while wide
    width = R // 2
    for _ in range(n_unroll):
        if width <= 1:
            break
        half = width // 2
        a = tuple(c[..., :half] for c in p)
        b = tuple(c[..., half:width] for c in p)
        p = _padd(f, a, b)
        width = half

    # Masked fixed-width dynamic-roll loop for the tail
    if width > 1:
        lane = lax.broadcasted_iota(jnp.uint32, (1, 1, width), 2)
        log_w = width.bit_length() - 1

        def body(i, p):
            half = (jnp.uint32(width) >> (i + 1).astype(jnp.uint32))
            # lane j reads j+half (mod width) == positive roll by
            # width-half (dynamic shifts must be non-negative)
            shift = (jnp.uint32(width) - half).astype(jnp.int32)
            rolled = tuple(pltpu.roll(c, shift, axis=2) for c in p)
            s = _padd(f, p, rolled)
            m = (lane < half).astype(jnp.uint32)
            return tuple(_sel_arith(m, sc, pc) for sc, pc in zip(s, p))

        p = lax.fori_loop(0, log_w, body, p, unroll=False)

    for ref, c in zip((ox_ref, oy_ref, oz_ref, ot_ref), p):
        ref[...] = c[..., 0][None, :, :]


@functools.partial(jax.jit,
                   static_argnames=("LB", "n_unroll", "interpret"))
def _msm_windows_pallas(scal_t: jnp.ndarray, tab,
                        LB: int = 4, n_unroll: int = 1,
                        interpret: bool = False):
    """scal_t: (L, 16, R) canonical limbs; tab: 4-tuple of (16, 16, R).
    Returns 4-tuple of (64, L, 16) lazy window sums (limbs last)."""
    L, _, R = scal_t.shape
    assert L % LB == 0
    grid = (L // LB, 64)

    in_specs = [
        pl.BlockSpec((3, NLIMBS), lambda g, w: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((LB, NLIMBS, R), lambda g, w: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((16, NLIMBS, R), lambda g, w: (0, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    out_specs = [
        pl.BlockSpec((1, LB, NLIMBS), lambda g, w: (w, g, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    out_shape = [jax.ShapeDtypeStruct((64, L, NLIMBS), jnp.uint32)
                 for _ in range(4)]

    kern = functools.partial(_msm_window_kernel, R, n_unroll)
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.asarray(_CONSTS), scal_t, *tab)
    return outs


# ---------------------------------------------------------------------------
# XLA-side wrapper: table build, transpose, Horner combine
# ---------------------------------------------------------------------------

def _build_tab(gens):
    """16-entry multiples table as 4 arrays (16, 16, R): entry v = v*G,
    coords transposed to (limb, lane)."""
    from . import edwards as ed

    tab = [ed.identity(gens.x.shape[:-1]), gens]
    for v in range(2, 16):
        tab.append(ed.add(tab[v - 1], gens))
    out = []
    for c in range(4):
        out.append(jnp.stack([jnp.swapaxes(p[c], -1, -2) for p in tab],
                             axis=0))
    return tuple(out)


@jax.jit
def _canonicalize(x):
    """Lazy (<2^256) coordinate -> canonical [0, p) (limbs last)."""
    from ..ff import fp25519 as fp

    return fp.reduce_canonical(x)


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


def msm_rows_pallas(scalars: jnp.ndarray, gens,
                    LB: int = 4, n_unroll: int = 1,
                    interpret: bool = False):
    """out[l] = sum_i scalars[l,i] * gens[i].

    scalars: (L, R, 16) canonical limbs; gens: (R,) PointArray.
    Drop-in equal to msm.msm_rows (same group elements)."""
    from . import edwards as ed

    L, R = scalars.shape[0], scalars.shape[1]
    tab = _build_tab(gens)
    scal_t = jnp.swapaxes(scalars, -1, -2)  # (L, 16, R)
    pad = (-L) % LB
    if pad:
        scal_t = jnp.concatenate(
            [scal_t, jnp.zeros((pad, NLIMBS, R), jnp.uint32)], axis=0)
    wins = _msm_windows_pallas(scal_t, tab, LB=LB, n_unroll=n_unroll,
                               interpret=interpret)
    wins = tuple(_canonicalize(c) for c in wins)
    out = _horner_windows(wins)
    if pad:
        out = ed.PointArray(*(c[:L] for c in out))
    return out
