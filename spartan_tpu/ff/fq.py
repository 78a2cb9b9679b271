"""Device (JAX) arithmetic in the ristretto255 scalar field Fq,
q = 2^252 + 27742317777372353535851937790883648493.

Values live in **Montgomery form** (aR mod q, R = 2^256) exactly like
the reference scalar (/root/reference/src/scalar/ristretto255.rs:195-199),
but as (..., 16) uint32 arrays of 16-bit limbs instead of 4xu64 — the
limb width where TPU VPU integer multiplies are exact.  REDC is the
full-width variant: m = T_lo * N' mod R; t = (T + m*q) / R; cond-sub.

Everything here is batched, jit-friendly and shape-stable; it is the
workhorse of the sumcheck/eq-table/SpMV kernels in spartan_tpu.poly.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.field import Q
from . import limb
from .limb import NLIMBS, WIDE

# ---------------------------------------------------------------------------
# Constants (computed with python ints at import, shipped as numpy)
# ---------------------------------------------------------------------------

R = 1 << 256
R2_INT = (R * R) % Q
R3_INT = (R * R * R) % Q
NPRIME_INT = (-pow(Q, -1, R)) % R  # -q^{-1} mod 2^256

Q_LIMBS = limb.int_to_limbs(Q)
R2 = limb.int_to_limbs(R2_INT)
R3 = limb.int_to_limbs(R3_INT)
NPRIME = limb.int_to_limbs(NPRIME_INT)
ONE_MONT = limb.int_to_limbs(R % Q)  # Montgomery form of 1
ZERO = np.zeros(NLIMBS, dtype=np.uint32)


def redc(t: jnp.ndarray) -> jnp.ndarray:
    """Montgomery reduction: t (..., 32 limbs, < R*q) -> t*R^-1 mod q,
    canonical (..., 16)."""
    t_lo = t[..., :NLIMBS]
    m = limb.mul_low(t_lo, jnp.asarray(NPRIME))
    mn = limb.mul_wide(m, jnp.asarray(Q_LIMBS))  # (..., 32)
    # sum needs 33 limbs for the top carry
    acc = limb.pad_limbs(t, WIDE + 1) + limb.pad_limbs(mn, WIDE + 1)
    s = limb.carry_prop(acc)
    out = s[..., NLIMBS : NLIMBS + NLIMBS]  # divide by 2^256
    # t < R*q so out < 2q: one conditional subtract
    return limb.cond_sub(out, jnp.asarray(Q_LIMBS))


@jax.jit
def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product: (aR)(bR)R^-1 = abR."""
    return redc(limb.mul_wide(a, b))


@jax.jit
def square(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


@jax.jit
def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s = limb.carry_prop(a + b)
    return limb.cond_sub(s, jnp.asarray(Q_LIMBS))


@jax.jit
def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return limb.sub_mod(a, b, jnp.asarray(Q_LIMBS))


@jax.jit
def neg(a: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros_like(a)
    return limb.sub_mod(z, a, jnp.asarray(Q_LIMBS))


@jax.jit
def to_mont(a_canonical: jnp.ndarray) -> jnp.ndarray:
    return mul(a_canonical, jnp.asarray(R2))


@jax.jit
def from_mont(a: jnp.ndarray) -> jnp.ndarray:
    return redc(limb.pad_limbs(a, WIDE))


# REDC holds ~8x the input bytes in live intermediates; a single
# (2^24, 16) from_mont peaked 16.52 G / 15.75 G HBM at SNARK-2^20
# encode (artifacts/profile_snark_20_tpu_r5.log, OOM).  Tables above
# this row count convert in equal power-of-two chunks (one compiled
# shape, +1 concat).
_FROM_MONT_CHUNK = 1 << 22


def from_mont_big(a: jnp.ndarray) -> jnp.ndarray:
    """from_mont with bounded peak memory for huge (n, 16) tables."""
    if a.ndim != 2 or a.shape[0] <= _FROM_MONT_CHUNK:
        return from_mont(a)
    n = a.shape[0]
    outs = [from_mont(a[i : i + _FROM_MONT_CHUNK])
            for i in range(0, n, _FROM_MONT_CHUNK)]
    return jnp.concatenate(outs, axis=0)


def reduce_wide(w: jnp.ndarray) -> jnp.ndarray:
    """Arbitrary (..., <=32 limb) integer -> canonical w mod q.

    Mirrors the reference's from_u512 decomposition
    (ristretto255.rs:435-466): w = lo + 2^256 hi;
    w mod q = from_mont(mont_mul(lo,R2) + mont_mul(hi,R3))."""
    w = limb.pad_limbs(w, WIDE)
    lo, hi = w[..., :NLIMBS], w[..., NLIMBS:]
    x = add(mul(lo, jnp.asarray(R2)), mul(hi, jnp.asarray(R3)))  # = w*R mod q
    return from_mont(x)


def sum_mod(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Modular sum along ``axis`` (inputs canonical Montgomery limbs).

    Hierarchical: integer-sum chunks of <= 2^12 rows in uint32 (limb
    sums < 2^28), carry-normalize, reduce mod q, repeat.  This is the
    TPU analogue of the sequential += reductions in the reference
    sumcheck loops (sumcheck.rs:199-228)."""
    if axis != 0:
        x = jnp.moveaxis(x, axis, 0)
    while x.shape[0] > 1:
        n = x.shape[0]
        chunk = min(n, 1 << 12)
        pad_rows = (-n) % chunk
        if pad_rows:
            x = jnp.concatenate(
                [x, jnp.zeros((pad_rows, *x.shape[1:]), dtype=x.dtype)], axis=0
            )
        x = x.reshape(x.shape[0] // chunk, chunk, *x.shape[1:])
        s = jnp.sum(x, axis=1, dtype=jnp.uint32)  # limbs < 2^28
        w = limb.carry_prop(limb.pad_limbs(s, NLIMBS + 2))
        x = reduce_wide(w)
    return x[0]


def dot_mod(a: jnp.ndarray, b: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """<a, b> mod q along axis: elementwise Montgomery mul then sum."""
    return sum_mod(mul(a, b), axis=axis)


@partial(jax.jit, static_argnums=1)
def pow_fixed(a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a host-known exponent: left-to-right square-and-multiply
    driven by lax.scan over the exponent bits (compact graph, batched)."""
    nbits = max(e.bit_length(), 1)
    bits = jnp.asarray(
        np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=np.uint32)
    )
    one = jnp.broadcast_to(jnp.asarray(ONE_MONT), a.shape)

    def body(res, bit):
        res = mul(res, res)
        res = limb.select(jnp.broadcast_to(bit == 1, res.shape[:-1]), mul(res, a), res)
        return res, None

    res, _ = lax.scan(body, one, bits)
    return res


def inv(a: jnp.ndarray) -> jnp.ndarray:
    """Batched inversion via Fermat (a^(q-2)); ~250 squarings, all
    vectorized.  Variable-time in nothing (fixed exponent)."""
    return pow_fixed(a, Q - 2)


# ---------------------------------------------------------------------------
# Host boundary
# ---------------------------------------------------------------------------

def encode_ints(xs) -> np.ndarray:
    """Canonical python ints -> Montgomery limb array (host packs
    canonical; the caller runs to_mont on device once)."""
    return limb.ints_to_limbs([x % Q for x in xs])


def encode_ints_mont(xs) -> np.ndarray:
    """Host-side full encode (packs already-Montgomery values)."""
    return limb.ints_to_limbs([(x % Q) * R % Q for x in xs])


def decode_to_ints(a) -> list[int]:
    """Montgomery limbs (device or numpy) -> canonical python ints.

    This is the prover's universal blocking device->host fetch point;
    utils.rt counts and times every call so per-phase round-trip counts
    are measured, not estimated."""
    import time as _time

    from ..utils import rt as _rt

    t0 = _time.perf_counter()
    canon = np.asarray(from_mont(jnp.asarray(a)))
    _rt.record(_time.perf_counter() - t0)
    return limb.limbs_to_ints(canon)
