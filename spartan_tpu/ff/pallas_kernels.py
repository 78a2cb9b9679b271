"""Pallas TPU kernels for the sumcheck hot loop.

The fused round kernel performs, in ONE pass over HBM:
  fold:   F[j] = T[j] + r*(T[j+m] - T[j])          (bound_poly_var_top)
  evals:  partial sums of the NEXT round polynomial at {0,2,3} over F

the Pallas counterpart of sumcheck._fold_then_evals (reference
sumcheck.rs:199-228 eval scan + :215-223 fold, fused).

Table representation: a size-2m table T is carried as the half pair
(T0, T1) = (T[:m], T[m:]).  Then
  * the fold output F (size m) pairs F[j] = fold(T0[j], T1[j]),
  * the next round's eval pairing (F[j], F[j+m/2]) is exactly
    (F0[j], F1[j]) of the output pair (F[:m/2], F[m/2:]),
so every grid step reads one aligned block of each input half-quarter
and writes one aligned block of each output half — no data reordering,
no cross-block communication, and the eval accumulates in a VMEM
scratch that is squashed mod q every step.

STATUS — DECIDED (round 5, VERDICT r4 next #7): the XLA path stays;
this kernel is NOT wired into the prover and will not be.  The closing
measurement (artifacts/round_kernel_tpu.json, real v5e): the XLA fused
round (sumcheck._fold_then_evals dataflow) runs a 2^20 cubic round in
0.082 ms — memory-bound on HBM; a hand kernel has no headroom to win,
while Mosaic's compile time for the fully-unrolled 16-limb Montgomery
pipeline (~30 muls x ~1k vector ops after unrolling) exceeds 30
minutes at 2^20 and the fori_loop "lean" variant compiles SLOWER
(dynamic_rotate lowering; PERF.md pallas ladder).  Unlike the row-MSM
(where Mosaic beats XLA 1000x because point adds blow up into
gather-heavy XLA graphs), the round kernel is pure elementwise limb
math that XLA already fuses optimally.  The file remains as the
correctness-tested record of that investigation (interpret mode in CI).

Mosaic lowering constraints discovered (and worked around in _Fq):
no scatter/.at[].set (-> iota/pad constructions), no scatter-add
(-> pad+add accumulation), no unsigned reductions (-> int32 sums), no
i1 vectors from compares (-> arithmetic 0/1 masks), no associative_scan
(-> explicit Kogge-Stone), no arith.minui (-> wrap-around trick).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from . import fq, limb
from .limb import NLIMBS, WIDE

# rows per grid step and per half: 1024 rows x 16 limbs x 4 B = 64 KiB
# per block; cubic uses 16 input + 8 output blocks + scratch ~ 1.6 MiB
# of VMEM.
_BLK = 1024

# Field constants shipped to the kernel as one (4, 16) operand —
# Pallas requires captured arrays to be explicit inputs.
_CONSTS = np.stack([fq.Q_LIMBS, fq.NPRIME, fq.R2, fq.R3], axis=0)


class _Fq:
    """Kernel-local Montgomery field ops parameterized by the consts
    block (same algebra as spartan_tpu.ff.fq, which closes over module
    globals and therefore cannot trace into a pallas kernel)."""

    def __init__(self, consts):
        self.q = consts[0]
        self.nprime = consts[1]
        self.r2 = consts[2]
        self.r3 = consts[3]

    @staticmethod
    def _one_lsb(shape):
        """[1, 0, 0, ...] along the limb axis without scatter (Mosaic
        has no scatter lowering; limb.one_lsb uses .at[].set).  Pure
        integer arithmetic — i1 vectors trip Mosaic's relayout."""
        col = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
        return ((col - 1) >> 31) & 1  # 1 iff col == 0 (uint wrap)

    @staticmethod
    def _shift_limbs(x, k, fill=0):
        """Shift k positions toward higher limbs along the last axis
        (drop the top k, pad the bottom k with `fill`)."""
        pad = [(0, 0)] * (x.ndim - 1) + [(k, 0)]
        return jnp.pad(x[..., :-k], pad, constant_values=fill)

    @classmethod
    def carry(cls, acc):
        """Mosaic-friendly carry_prop: explicit Kogge-Stone over the
        limb axis (limb.carry_prop's associative_scan recursion creates
        zero-size slices Mosaic rejects)."""
        d = acc & limb.LIMB_MASK
        c = acc >> limb.LIMB_BITS
        s = d + cls._shift_limbs(c, 1)
        g = (s >> limb.LIMB_BITS).astype(jnp.uint32)
        # p = (s mod 2^16 == 0xFFFF), computed without i1 vectors
        p = (((s & limb.LIMB_MASK) + 1) >> limb.LIMB_BITS) & 1
        n = s.shape[-1]
        shift = 1
        while shift < n:
            gsh = cls._shift_limbs(g, shift, fill=0)
            psh = cls._shift_limbs(p, shift, fill=1)
            g = g | (p & gsh)
            p = p & psh
            shift *= 2
        cin = cls._shift_limbs(g, 1)
        return (s + cin) & limb.LIMB_MASK

    @staticmethod
    def _pad_to(x, left: int, total: int):
        """Place x at limb offset `left` in a width-`total` buffer
        (pure pad — Mosaic rejects .at[].add's scatter-add lowering)."""
        pad = [(0, 0)] * (x.ndim - 1) + [(left, total - left - x.shape[-1])]
        return jnp.pad(x, pad)

    @classmethod
    def _mul_wide(cls, a, b):
        na, nb = a.shape[-1], b.shape[-1]
        total = na + nb + 1
        acc = None
        for i in range(na):
            prod = a[..., i : i + 1] * b
            term = (cls._pad_to(prod & limb.LIMB_MASK, i, total)
                    + cls._pad_to(prod >> limb.LIMB_BITS, i + 1, total))
            acc = term if acc is None else acc + term
        return cls.carry(acc)[..., : na + nb]

    @classmethod
    def _mul_low(cls, a, b, n=NLIMBS):
        total = n + 1
        acc = None
        for i in range(n):
            width = n - i
            prod = a[..., i : i + 1] * b[..., :width]
            term = (cls._pad_to(prod & limb.LIMB_MASK, i, total)
                    + cls._pad_to(prod >> limb.LIMB_BITS, i + 1, total))
            acc = term if acc is None else acc + term
        return cls.carry(acc)[..., :n]

    @staticmethod
    def _ge_mask(a, b):
        """(..., n) >= compare -> (..., 1) uint32 0/1, branch- and
        bool-free: scan limbs MSB-down via arithmetic select."""
        res = jnp.ones((*a.shape[:-1], 1), dtype=jnp.uint32)
        for k in range(a.shape[-1]):
            ak = a[..., k : k + 1]
            bk = b[..., k : k + 1]
            # gt/lt in {0,1} via 17-bit-safe subtraction tricks
            gt = ((bk - ak) >> 31) & 1  # 1 iff bk < ak (uint32 wrap)
            lt = ((ak - bk) >> 31) & 1
            res = gt + (1 - gt) * (1 - lt) * res
        return res

    def _cond_sub(self, a, m):
        mb = limb.pad_limbs(jnp.broadcast_to(m, (*a.shape[:-1], m.shape[-1])),
                            a.shape[-1])
        need = self._ge_mask(a, mb)  # (..., 1) in {0, 1}
        diff = self.carry(
            a + (limb.LIMB_MASK - mb) + self._one_lsb(a.shape)
        )[..., : a.shape[-1]]
        return need * diff + (1 - need) * a

    def _sub_mod(self, a, b, m):
        t = self.carry(
            a + m + (limb.LIMB_MASK - b) + self._one_lsb(a.shape))
        return self._cond_sub(t, m)

    def redc(self, t):
        t_lo = t[..., :NLIMBS]
        m = self._mul_low(t_lo, self.nprime)
        mn = self._mul_wide(m, self.q)
        acc = limb.pad_limbs(t, WIDE + 1) + limb.pad_limbs(mn, WIDE + 1)
        s = self.carry(acc)
        out = s[..., NLIMBS : 2 * NLIMBS]
        return self._cond_sub(out, self.q)

    def mul(self, a, b):
        return self.redc(self._mul_wide(a, b))

    def add(self, a, b):
        return self._cond_sub(self.carry(a + b), self.q)

    def sub(self, a, b):
        return self._sub_mod(a, b, self.q)

    def reduce_wide(self, w):
        w = limb.pad_limbs(w, WIDE)
        lo, hi = w[..., :NLIMBS], w[..., NLIMBS:]
        x = self.add(self.mul(lo, self.r2), self.mul(hi, self.r3))
        return self.redc(limb.pad_limbs(x, WIDE))

    def comb_cubic(self, a, b, c, d):
        """eq * (Az*Bz - Cz) — the phase-1 comb (r1csproof.rs:85-89)."""
        return self.mul(a, self.sub(self.mul(b, c), d))

    def comb_quad(self, a, b):
        return self.mul(a, b)


def _usum(x):
    """Column sum of (BLK, 16) canonical limbs -> (1, 16); Mosaic lacks
    unsigned reductions, so sum in int32 (limb sums < 2^27 in range)."""
    return jnp.sum(x.astype(jnp.int32), axis=0,
                   keepdims=True).astype(jnp.uint32)


def _fold_evals_kernel(ntab: int, consts_ref, r_ref, *refs):
    """refs: ntab*4 inputs (per table: T0@j, T0@j+grid, T1@j, T1@j+grid),
    then ntab*2 outputs (F0, F1 blocks), then 3 eval outputs (1, 16)
    each (e0, e2, e3), then 3 matching (1, 16) scratch accumulators."""
    F = _Fq(consts_ref[...])
    r = r_ref[...]  # (1, 16)
    F0, F1 = [], []
    for t in range(ntab):
        a0j = refs[4 * t][...]       # T0[j-block]
        a0k = refs[4 * t + 1][...]   # T0[j+m/2-block]
        a1j = refs[4 * t + 2][...]   # T1[j-block]
        a1k = refs[4 * t + 3][...]   # T1[j+m/2-block]
        f0 = F.add(a0j, F.mul(r, F.sub(a1j, a0j)))
        f1 = F.add(a0k, F.mul(r, F.sub(a1k, a0k)))
        refs[4 * ntab + 2 * t][...] = f0
        refs[4 * ntab + 2 * t + 1][...] = f1
        F0.append(f0)
        F1.append(f1)

    eval_outs = refs[6 * ntab : 6 * ntab + 3]
    accs = refs[6 * ntab + 3 : 6 * ntab + 6]

    if ntab == 4:
        e0 = _usum(F.comb_cubic(*F0))
        p2 = [F.sub(F.add(h, h), l) for h, l in zip(F1, F0)]
        e2 = _usum(F.comb_cubic(*p2))
        p3 = [F.add(x2, F.sub(h, l)) for x2, h, l in zip(p2, F1, F0)]
        e3 = _usum(F.comb_cubic(*p3))
    else:
        e0 = _usum(F.comb_quad(*F0))
        p2 = [F.sub(F.add(h, h), l) for h, l in zip(F1, F0)]
        e2 = _usum(F.comb_quad(*p2))
        e3 = jnp.zeros_like(e2)

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        for acc in accs:
            acc[...] = jnp.zeros_like(acc[...])

    # modular squash every step: uint32 column sums stay < 2^28 + 2^16
    for acc, e in zip(accs, (e0, e2, e3)):
        s = acc[...] + e
        w = F.carry(limb.pad_limbs(s, NLIMBS + 2))
        acc[...] = F.reduce_wide(w)

    @pl.when(g == pl.num_programs(0) - 1)
    def _fin():
        for out, acc in zip(eval_outs, accs):
            out[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("ntab", "interpret", "blk"))
def _fold_evals_call(halves, r_m, ntab: int, interpret: bool, blk: int):
    """halves: flat tuple (T0_0, T1_0, T0_1, T1_1, ...), each (m, 16)."""
    m = halves[0].shape[0]
    bs = min(blk, m // 2) if m >= 2 else 1
    grid = max((m // 2) // bs, 1)

    in_specs = [
        pl.BlockSpec((4, NLIMBS), lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NLIMBS), lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [jnp.asarray(_CONSTS), r_m.reshape(1, NLIMBS)]
    for t in range(ntab):
        T0, T1 = halves[2 * t], halves[2 * t + 1]
        for arr, block_off in ((T0, 0), (T0, grid), (T1, 0), (T1, grid)):
            operands.append(arr)
            in_specs.append(
                pl.BlockSpec((bs, NLIMBS),
                             lambda g, _o=block_off: (g + _o, 0),
                             memory_space=pltpu.VMEM))

    out_specs = []
    out_shape = []
    for _ in range(2 * ntab):
        out_specs.append(pl.BlockSpec((bs, NLIMBS), lambda g: (g, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((m // 2, NLIMBS), jnp.uint32))
    for _ in range(3):
        out_specs.append(pl.BlockSpec((1, NLIMBS), lambda g: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, NLIMBS), jnp.uint32))

    outs = pl.pallas_call(
        functools.partial(_fold_evals_kernel, ntab),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((1, NLIMBS), jnp.uint32)
                        for _ in range(3)],
        interpret=interpret,
    )(*operands)
    new_halves = outs[: 2 * ntab]
    evals = jnp.concatenate(outs[2 * ntab : 2 * ntab + 3], axis=0)
    return tuple(new_halves), evals


def fold_evals_pairs(halves, r_m, interpret: bool = False, blk: int = _BLK):
    """Fused fold + next-round evals on half-pair state.

    halves: tuple (T0_0, T1_0, T0_1, T1_1, ...) of (m, 16) Montgomery
    arrays (table t is the concatenation T0_t || T1_t, size 2m; m >= 2).
    Returns (new_halves, evals) where evals is (3, 16) Montgomery rows
    e0, e2, e3 of the round polynomial over the folded tables (e3 = 0
    for the quad comb).
    """
    ntab = len(halves) // 2
    assert ntab in (2, 4) and len(halves) == 2 * ntab
    return _fold_evals_call(tuple(halves), r_m, ntab, interpret, blk)


def split_table(T: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    m = T.shape[0] // 2
    return T[:m], T[m:]


def join_halves(T0: jnp.ndarray, T1: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([T0, T1], axis=0)


def fold_evals(tables, r_m, interpret: bool = False, blk: int = _BLK):
    """Whole-table convenience wrapper: list of (n, 16) tables in,
    (folded_tables, evals) out.  For the zero-copy round loop use
    fold_evals_pairs and keep the half-pair state."""
    halves = []
    for T in tables:
        T0, T1 = split_table(T)
        halves += [T0, T1]
    new_halves, evals = fold_evals_pairs(halves, r_m, interpret, blk)
    folded = [
        join_halves(new_halves[2 * t], new_halves[2 * t + 1])
        for t in range(len(tables))
    ]
    return folded, evals
