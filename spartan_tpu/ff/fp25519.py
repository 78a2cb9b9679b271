"""Device (JAX) arithmetic in Fp25519, p = 2^255 - 19 — the coordinate
field of the ristretto255 group.

Pseudo-Mersenne reduction (2^256 === 38 mod p) makes multiplication one
wide product plus three cheap folds — far cheaper than Montgomery, and
the reason point kernels keep coordinates in this field's canonical
form [0, p).  Batched over leading dims; feeds spartan_tpu.curve.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.field import P25519 as P
from . import limb
from .limb import LIMB_MASK, NLIMBS

P_LIMBS = limb.int_to_limbs(P)
ONE = limb.int_to_limbs(1)
ZERO = np.zeros(NLIMBS, dtype=np.uint32)


def _fold(t: jnp.ndarray) -> jnp.ndarray:
    """(..., 32) 512-bit value -> (..., 16) value < 2^256 congruent mod p
    (three-stage 38-fold; see module docstring)."""
    lo, hi = t[..., :NLIMBS], t[..., NLIMBS:]
    # fold 1: r = lo + 38*hi  (< 39 * 2^256, 17 limbs)
    p38 = hi * jnp.uint32(38)  # < 2^22, exact
    acc = jnp.zeros((*t.shape[:-1], NLIMBS + 1), dtype=jnp.uint32)
    acc = acc.at[..., :NLIMBS].add(lo)
    acc = acc.at[..., :NLIMBS].add(p38 & LIMB_MASK)
    acc = acc.at[..., 1 : NLIMBS + 1].add(p38 >> 16)
    r = limb.carry_prop(acc)
    # fold 2: r2 = r_lo + 38 * r[16]   (r[16] < 39)
    hi2 = r[..., NLIMBS] * jnp.uint32(38)  # < 1482
    acc2 = jnp.zeros_like(r)
    acc2 = acc2.at[..., :NLIMBS].add(r[..., :NLIMBS])
    acc2 = acc2.at[..., 0].add(hi2)
    r2 = limb.carry_prop(acc2)
    # fold 3: if the (now 0/1) top limb is set, r2_lo < 2^22, so +38 is safe
    top = r2[..., NLIMBS]
    r3 = limb.carry_prop(r2[..., :NLIMBS].at[..., 0].add(top * jnp.uint32(38)))
    return r3


def reduce_canonical(a: jnp.ndarray) -> jnp.ndarray:
    """Value < 2^256 -> canonical [0, p): two conditional subtracts
    (2^256 = 2p + 38)."""
    a = limb.cond_sub(a, jnp.asarray(P_LIMBS))
    return limb.cond_sub(a, jnp.asarray(P_LIMBS))


@jax.jit
def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return reduce_canonical(_fold(limb.mul_wide(a, b)))


@jax.jit
def square(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


@jax.jit
def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return limb.cond_sub(limb.carry_prop(a + b), jnp.asarray(P_LIMBS))


@jax.jit
def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return limb.sub_mod(a, b, jnp.asarray(P_LIMBS))


@jax.jit
def neg(a: jnp.ndarray) -> jnp.ndarray:
    return limb.sub_mod(jnp.zeros_like(a), a, jnp.asarray(P_LIMBS))


def mul_small(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """a * k for small host constant k (< 2^10)."""
    t = limb.mul_small(a, k)  # 17 limbs
    hi = t[..., NLIMBS] * jnp.uint32(38)
    r = limb.carry_prop(t[..., :NLIMBS].at[..., 0].add(hi))
    return reduce_canonical(r)


@partial(jax.jit, static_argnums=1)
def pow_fixed(a: jnp.ndarray, e: int) -> jnp.ndarray:
    nbits = max(e.bit_length(), 1)
    bits = jnp.asarray(
        np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=np.uint32)
    )
    result = jnp.broadcast_to(jnp.asarray(ONE), a.shape)

    def body(res, bit):
        res = mul(res, res)
        res = limb.select(jnp.broadcast_to(bit == 1, res.shape[:-1]), mul(res, a), res)
        return res, None

    result, _ = lax.scan(body, result, bits)
    return result


def inv(a: jnp.ndarray) -> jnp.ndarray:
    return pow_fixed(a, P - 2)


def is_negative(a: jnp.ndarray) -> jnp.ndarray:
    """ristretto sign: odd == negative (inputs canonical)."""
    return (a[..., 0] & 1) == 1


def ct_abs(a: jnp.ndarray) -> jnp.ndarray:
    return limb.select(is_negative(a), neg(a), a)


# -- square roots (the compression workhorse) --------------------------------

SQRT_M1_LIMBS = limb.int_to_limbs(
    pow(2, (P - 1) // 4, P)
    if pow(2, (P - 1) // 4, P) % 2 == 0
    else P - pow(2, (P - 1) // 4, P)
)


def sqrt_ratio_m1(u: jnp.ndarray, v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched RFC 9496 SQRT_RATIO_M1: returns (was_square bool (...,),
    non-negative root (..., 16)).  One fused exponentiation per batch —
    this is what makes device-side point compression cheap."""
    v2 = square(v)
    v3 = mul(v2, v)
    v7 = mul(square(v3), v)
    r = mul(mul(u, v3), pow_fixed(mul(u, v7), (P - 5) // 8))
    check = mul(v, square(r))
    neg_u = neg(u)
    correct = limb.eq(check, u)
    flipped = limb.eq(check, neg_u)
    flipped_i = limb.eq(check, mul(neg_u, jnp.asarray(SQRT_M1_LIMBS)))
    r = limb.select(flipped | flipped_i, mul(r, jnp.asarray(SQRT_M1_LIMBS)), r)
    return (correct | flipped), ct_abs(r)


# -- host boundary ------------------------------------------------------------

def encode_ints(xs) -> np.ndarray:
    return limb.ints_to_limbs([x % P for x in xs])


def decode_to_ints(a) -> list[int]:
    return limb.limbs_to_ints(np.asarray(a))
