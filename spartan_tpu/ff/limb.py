"""Fixed-limb big-integer kernels for TPU (JAX/XLA).

Representation: a 256-bit integer is a ``(..., 16)`` uint32 array of
16-bit limbs, little-endian limb order.  16x16-bit limb products fit a
uint32 exactly and column sums stay < 2^22, so the whole schoolbook
multiplier runs on the VPU integer path with no 64-bit emulation — the
TPU-native replacement for the reference's u64 Montgomery limbs
(/root/reference/src/scalar/ristretto255.rs:642-714).

All functions are shape-polymorphic over leading batch dims and are
pure jnp (jit/vmap/shard_map friendly).  Hot compositions are fused by
XLA; Pallas variants live in spartan_tpu.ff.pallas_kernels.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

NLIMBS = 16  # limbs per 256-bit element
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
WIDE = 2 * NLIMBS  # limbs in a 512-bit product


# ---------------------------------------------------------------------------
# Host <-> device packing
# ---------------------------------------------------------------------------

def int_to_limbs(x: int, n: int = NLIMBS) -> np.ndarray:
    """One python int -> (n,) uint32 limb array (host helper)."""
    return np.array([(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)],
                    dtype=np.uint32)


def limbs_to_int(a) -> int:
    """(n,) limb array -> python int (host helper)."""
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(a))


def ints_to_limbs(xs, n: int = NLIMBS) -> np.ndarray:
    """List of ints -> (len, n) uint32, via a vectorized byte decode."""
    raw = b"".join(int(x).to_bytes(2 * n, "little") for x in xs)
    u16 = np.frombuffer(raw, dtype="<u2").reshape(len(xs), n)
    return u16.astype(np.uint32)


def limbs_to_ints(a) -> list[int]:
    a = np.asarray(a, dtype=np.uint32)
    flat = a.reshape(-1, a.shape[-1]).astype("<u2")
    out = [int.from_bytes(row.tobytes(), "little") for row in flat]
    return out


# ---------------------------------------------------------------------------
# Carry handling
# ---------------------------------------------------------------------------

def carry_prop(acc: jnp.ndarray) -> jnp.ndarray:
    """Propagate carries so every limb is < 2^16.  ``acc`` limbs may hold
    values up to 2^32-1; the final carry is dropped only if the caller
    guarantees the true value fits the limb count (callers below size
    their buffers so it does).

    Carry-lookahead form: one relaxation pass (digit/carry split) then a
    log-depth (generate, propagate) scan — ~30 HLO ops for 32 limbs
    instead of a 32-step sequential ripple, which keeps the compiled
    graphs of the point kernels small.
    """
    import jax.lax as lax

    d = acc & LIMB_MASK
    c = acc >> LIMB_BITS  # carry of limb k feeds limb k+1; both < 2^16
    c_shift = jnp.pad(c[..., :-1], [(0, 0)] * (acc.ndim - 1) + [(1, 0)])
    s = d + c_shift  # <= 2^17 - 2: at most one more carry per position
    g = (s >> LIMB_BITS).astype(jnp.uint32)  # generate
    p = ((s & LIMB_MASK) == LIMB_MASK).astype(jnp.uint32)  # propagate

    def combine(a, b):
        ga, pa = a
        gb, pb = b
        return gb | (pb & ga), pa & pb

    gs, _ = lax.associative_scan(combine, (g, p), axis=-1)
    cin = jnp.pad(gs[..., :-1], [(0, 0)] * (acc.ndim - 1) + [(1, 0)])
    return (s + cin) & LIMB_MASK


# ---------------------------------------------------------------------------
# Wide multiply / small multiply / add / sub
# ---------------------------------------------------------------------------

_IMPL_OVERRIDE: str | None = None


class mul_impl_override:
    """Scope a mul formulation: ``with limb.mul_impl_override("loop"):``.

    Round-5 need: the unrolled form's accumulator chain holds ~22 live
    copies, which at Spark-2^20 batched shapes exceeds the compiler's
    memory (35.7 G > 15.75 G HBM estimate, and the relay's XLA compile
    helper got OOM-killed on the loop form at single-batch 2^20 phase
    shapes) — so the NIZK phases keep "unrolled" (proven at 2^20)
    while the batched Spark section scopes "loop".  Outputs are
    identical either way; jit caches key on shapes, and the two
    regimes use disjoint shapes (single-batch (n, 16) vs batched
    (B, n, 16)), so cached executables never cross regimes in
    practice."""

    def __init__(self, impl: str):
        self.impl = impl

    def __enter__(self):
        global _IMPL_OVERRIDE
        self._old = _IMPL_OVERRIDE
        _IMPL_OVERRIDE = self.impl

    def __exit__(self, *exc):
        global _IMPL_OVERRIDE
        _IMPL_OVERRIDE = self._old


def _mul_impl() -> str:
    """Schoolbook formulation: "unrolled" (16 static partial products via
    dynamic-update-slice — biggest graph, fastest steady-state) or
    "loop" (lax.fori_loop + dynamic roll — ~3x smaller HLO, ~3x faster
    XLA/LLVM compile, ~2x slower steady-state on CPU).

    Compile time is the binding constraint of this build (SURVEY §7
    "hard parts"; one-core LLVM pays seconds per unrolled field mul),
    so the CPU backend — tests, dev, the driver's multichip dryrun —
    defaults to "loop"; accelerators default to "unrolled".
    SPARTAN_TPU_MUL_IMPL overrides.  Identical results either way.
    """
    import os

    if _IMPL_OVERRIDE is not None:
        return _IMPL_OVERRIDE
    v = os.environ.get("SPARTAN_TPU_MUL_IMPL")
    if v is not None:
        return v
    import jax

    return "loop" if jax.default_backend() == "cpu" else "unrolled"


def mul_wide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(...,16) x (...,16) -> (...,32) full 512-bit product.

    Schoolbook with lo/hi 16-bit split; column accumulators stay < 2^22
    so a single final carry pass suffices.  Formulation per _mul_impl.
    """
    na, nb = a.shape[-1], b.shape[-1]
    if _mul_impl() == "loop" and na == nb:
        return _mul_wide_loop(a, b)
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    acc = jnp.zeros((*shape, na + nb + 1), dtype=jnp.uint32)
    for i in range(na):
        p = a[..., i : i + 1] * b  # exact uint32 products
        acc = acc.at[..., i : i + nb].add(p & LIMB_MASK)
        acc = acc.at[..., i + 1 : i + 1 + nb].add(p >> LIMB_BITS)
    return carry_prop(acc)[..., : na + nb]


def _mul_wide_loop(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mul_wide as a fori_loop over a's limbs with dynamic rolls: the
    compiled graph contains ONE partial-product instance instead of 16.
    Column sums stay < 16 * 2 * (2^16-1) < 2^22 in uint32 — same bound
    as the unrolled form."""
    import jax.lax as lax

    n = a.shape[-1]
    wide = 2 * n + 1
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    bpad = pad_limbs(jnp.broadcast_to(b, (*shape, n)), wide)

    def body(i, acc):
        ai = lax.dynamic_index_in_dim(a, i, axis=-1, keepdims=True)
        p = ai * bpad  # (..., wide); only the first n entries nonzero
        plo = jnp.roll(p & LIMB_MASK, i, axis=-1)
        phi = jnp.roll(p >> LIMB_BITS, i + 1, axis=-1)
        return acc + plo + phi

    acc = jnp.zeros((*shape, wide), dtype=jnp.uint32)
    acc = lax.fori_loop(0, n, body, acc)
    return carry_prop(acc)[..., : 2 * n]


def mul_low(a: jnp.ndarray, b: jnp.ndarray, n: int = NLIMBS) -> jnp.ndarray:
    """Low n limbs of a*b (i.e. a*b mod 2^(16n)) — the Montgomery m-step."""
    if _mul_impl() == "loop":
        # the loop form computes the full product anyway; truncate
        return _mul_wide_loop(a[..., :n], b[..., :n])[..., :n]
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    acc = jnp.zeros((*shape, n + 1), dtype=jnp.uint32)
    for i in range(n):
        width = n - i
        p = a[..., i : i + 1] * b[..., :width]
        acc = acc.at[..., i : i + width].add(p & LIMB_MASK)
        acc = acc.at[..., i + 1 : i + 1 + width].add(p >> LIMB_BITS)
    return carry_prop(acc)[..., :n]


def mul_small(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Multiply by a small constant (k < 2^10), keeping limb count + 1."""
    assert 0 <= k < (1 << 10)
    p = a * jnp.uint32(k)
    acc = jnp.zeros((*a.shape[:-1], a.shape[-1] + 1), dtype=jnp.uint32)
    acc = acc.at[..., : a.shape[-1]].add(p & LIMB_MASK)
    acc = acc.at[..., 1 : 1 + a.shape[-1]].add(p >> LIMB_BITS)
    return carry_prop(acc)


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Limb-wise add + carry (result keeps max(len) limbs; caller sizes)."""
    n = max(a.shape[-1], b.shape[-1])
    a = pad_limbs(a, n)
    b = pad_limbs(b, n)
    return carry_prop(a + b)


def pad_limbs(a: jnp.ndarray, n: int) -> jnp.ndarray:
    if a.shape[-1] == n:
        return a
    assert a.shape[-1] < n
    pad = [(0, 0)] * (a.ndim - 1) + [(0, n - a.shape[-1])]
    return jnp.pad(a, pad)


def sub_mod(a: jnp.ndarray, b: jnp.ndarray, modulus_limbs: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod m for canonical a, b < m: compute a + m - b then
    conditionally subtract m (constant-shape, branch-free).  Limb sums
    a + m + ~b + 1 <= 3*(2^16-1) + 1 < 2^18 — safe in uint32."""
    t = carry_prop(a + modulus_limbs + (LIMB_MASK - b) + one_lsb(a))
    # t = a + m - b, in [1 .. 2m); the wrap 2^(16n) is dropped because
    # the true value fits n limbs.
    return cond_sub(t, modulus_limbs)


def one_lsb(a: jnp.ndarray) -> jnp.ndarray:
    """Array like a with 1 at limb 0 (for two's-complement +1)."""
    z = jnp.zeros_like(a)
    return z.at[..., 0].set(1)


def ge(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b limb-lexicographic compare; returns bool (...,).

    Carry-out form: a >= b iff a + (2^(16n) - b) carries out of limb
    n-1, i.e. limb n of the (n+1)-limb sum a + ~b + 1 is 1 — one
    carry_prop instead of an unrolled most-significant-diff chain."""
    t = _sub_borrow(a, b)
    return t[..., a.shape[-1]] == 1


def _sub_borrow(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(n+1)-limb two's-complement difference a + ~b + 1: low n limbs
    are a - b mod 2^(16n); limb n is the NOT-borrow flag (1 iff
    a >= b)."""
    n = a.shape[-1]
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    s = jnp.broadcast_to(a + (LIMB_MASK - b), (*shape, n))
    acc = pad_limbs(s, n + 1).at[..., 0].add(1)  # limbs <= 2^17 - 1
    return carry_prop(acc)


def cond_sub(a: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """a - m if a >= m else a (single conditional subtract),
    branch-free via the carry-out of a - m."""
    n = a.shape[-1]
    t = _sub_borrow(a, jnp.broadcast_to(m, a.shape))
    need = t[..., n:] == 1  # (..., 1): a >= m
    return jnp.where(need, t[..., :n], a)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """cond ? a : b with cond shaped (...,) and a,b (..., n)."""
    return jnp.where(cond[..., None], a, b)
