"""Batched twisted-Edwards point arithmetic on device (JAX).

A point batch is a pytree of four (..., 16)-limb Fp25519 coordinate
arrays (extended coordinates, a = -1).  All group operations are
data-parallel over the batch — the TPU replacement for the reference's
per-point curve25519-dalek calls (reference src/group.rs).

Cost per unified add: 9 field muls; per double: 4 muls + 4 squares.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core import edwards as host_ed
from ..core.field import P25519
from ..ff import fp25519 as fp
from ..ff import limb


class PointArray(NamedTuple):
    """Extended-coordinate point batch; each field is (..., 16) uint32."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    t: jnp.ndarray

    @property
    def shape(self):
        return self.x.shape[:-1]


D2_LIMBS = limb.int_to_limbs(host_ed.D2)
D_LIMBS = limb.int_to_limbs(host_ed.D)


def identity(shape=()) -> PointArray:
    zero = jnp.zeros((*shape, limb.NLIMBS), dtype=jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(fp.ONE), (*shape, limb.NLIMBS))
    return PointArray(zero, one, one, zero)


@jax.jit
def add(p: PointArray, q: PointArray) -> PointArray:
    """Unified addition (add-2008-hwcd-3); valid for all inputs incl.
    doubling and identity."""
    a = fp.mul(fp.sub(p.y, p.x), fp.sub(q.y, q.x))
    b = fp.mul(fp.add(p.y, p.x), fp.add(q.y, q.x))
    c = fp.mul(fp.mul(p.t, jnp.asarray(D2_LIMBS)), q.t)
    d = fp.mul(fp.add(p.z, p.z), q.z)
    e = fp.sub(b, a)
    f = fp.sub(d, c)
    g = fp.add(d, c)
    h = fp.add(b, a)
    return PointArray(fp.mul(e, f), fp.mul(g, h), fp.mul(f, g), fp.mul(e, h))


@jax.jit
def double(p: PointArray) -> PointArray:
    a = fp.square(p.x)
    b = fp.square(p.y)
    c = fp.add(fp.square(p.z), fp.square(p.z))
    d = fp.neg(a)
    e = fp.sub(fp.sub(fp.square(fp.add(p.x, p.y)), a), b)
    g = fp.add(d, b)
    f = fp.sub(g, c)
    h = fp.sub(d, b)
    return PointArray(fp.mul(e, f), fp.mul(g, h), fp.mul(f, g), fp.mul(e, h))


def neg(p: PointArray) -> PointArray:
    return PointArray(fp.neg(p.x), p.y, p.z, fp.neg(p.t))


def select(mask: jnp.ndarray, a: PointArray, b: PointArray) -> PointArray:
    """mask (...,) ? a : b."""
    return PointArray(
        limb.select(mask, a.x, b.x),
        limb.select(mask, a.y, b.y),
        limb.select(mask, a.z, b.z),
        limb.select(mask, a.t, b.t),
    )


def _scalar_bits_msb(scalars: jnp.ndarray) -> jnp.ndarray:
    """Canonical scalar limbs (..., 16) -> (256, ...) bit planes, MSB first."""
    planes = []
    for j in range(255, -1, -1):
        planes.append((scalars[..., j // 16] >> (j % 16)) & 1)
    return jnp.stack(planes, axis=0)


@jax.jit
def scalar_mul(p: PointArray, scalars: jnp.ndarray) -> PointArray:
    """Batched variable-base scalar multiplication: p[i] * scalars[i].

    scalars are *canonical* (non-Montgomery) limbs.  MSB-first
    double-and-add over a lax.scan — 256 iterations of one double and
    one selected add, fully vectorized over the batch.
    """
    bits = _scalar_bits_msb(scalars)
    acc0 = identity(p.shape)

    def body(acc, bit):
        acc = double(acc)
        acc = select(bit == 1, add(acc, p), acc)
        return acc, None

    acc, _ = lax.scan(body, acc0, bits)
    return acc


def sum_reduce(p: PointArray, axis: int = 0) -> PointArray:
    """Tree-sum of a point batch along ``axis`` (log N rounds of batched
    adds) — the device analogue of the fold inside vartime MSM."""
    if axis != 0:
        p = PointArray(*(jnp.moveaxis(c, axis, 0) for c in p))
    n = p.x.shape[0]
    while n > 1:
        if n % 2 == 1:
            p = PointArray(*(
                jnp.concatenate([c, c2[None]], axis=0)
                for c, c2 in zip(p, identity(p.shape[1:]))
            ))
            n += 1
        half = n // 2
        p = add(
            PointArray(*(c[:half] for c in p)),
            PointArray(*(c[half:n] for c in p)),
        )
        n = half
    return PointArray(*(c[0] for c in p))


# ---------------------------------------------------------------------------
# Host boundary
# ---------------------------------------------------------------------------

def from_host(points: list[host_ed.Point]) -> PointArray:
    def pack(attr):
        return jnp.asarray(limb.ints_to_limbs([getattr(pt, attr) for pt in points]))

    return PointArray(pack("X"), pack("Y"), pack("Z"), pack("T"))


def to_host(p: PointArray) -> list[host_ed.Point]:
    arrs = [limb.limbs_to_ints(np.asarray(c)) for c in p]
    flat = [host_ed.Point(x, y, z, t) for x, y, z, t in zip(*arrs)]
    return flat
