"""Device-side ristretto255 encoding (batched RFC 9496 ENCODE/DECODE).

Point compression is on the prover's hot path — every Pedersen
commitment row must be compressed before entering the Fiat-Shamir
transcript (reference dense_mlpoly.rs:148-162 calls .compress() per
row) — so it runs on device: the dominant cost, one sqrt_ratio
exponentiation, is a 250-step scan vectorized over the whole batch.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import ristretto as host_ri
from ..ff import fp25519 as fp
from ..ff import limb
from .edwards import PointArray

SQRT_M1 = jnp.asarray(fp.SQRT_M1_LIMBS)
INVSQRT_A_MINUS_D = limb.int_to_limbs(host_ri.INVSQRT_A_MINUS_D)


@jax.jit
def compress(p: PointArray) -> jnp.ndarray:
    """Batched ENCODE: PointArray (...,) -> canonical s limbs (..., 16).

    Convert to 32-byte strings host-side with ``limbs_to_bytes``.
    """
    X, Y, Z, T = p.x, p.y, p.z, p.t
    u1 = fp.mul(fp.add(Z, Y), fp.sub(Z, Y))
    u2 = fp.mul(X, Y)
    _, invsqrt = fp.sqrt_ratio_m1(
        jnp.broadcast_to(jnp.asarray(fp.ONE), u1.shape),
        fp.mul(u1, fp.square(u2)),
    )
    den1 = fp.mul(invsqrt, u1)
    den2 = fp.mul(invsqrt, u2)
    z_inv = fp.mul(fp.mul(den1, den2), T)
    ix0 = fp.mul(X, SQRT_M1)
    iy0 = fp.mul(Y, SQRT_M1)
    enchanted = fp.mul(den1, jnp.asarray(INVSQRT_A_MINUS_D))
    rotate = fp.is_negative(fp.mul(T, z_inv))
    x = limb.select(rotate, iy0, X)
    y = limb.select(rotate, ix0, Y)
    den_inv = limb.select(rotate, enchanted, den2)
    y = limb.select(fp.is_negative(fp.mul(x, z_inv)), fp.neg(y), y)
    s = fp.ct_abs(fp.mul(den_inv, fp.sub(Z, y)))
    return s


_COMPRESS_FLOOR = 1 << 7


def compress_to_bytes(p: PointArray) -> list[bytes]:
    """Batch compress and serialize (host boundary, for transcripts).

    The batch is flattened and padded with identity points to
    max(next_pow2, 2^7) so every call shares a handful of compiled
    ``compress`` modules — the prover calls this at dozens of distinct
    batch sizes, and each distinct shape is otherwise its own
    ~10 s-to-minutes XLA/LLVM compile."""
    from . import edwards as dev_ed

    flat = PointArray(*(c.reshape(-1, c.shape[-1]) for c in p))
    n = flat.x.shape[0]
    n2 = max(1 << max((n - 1).bit_length(), 0), _COMPRESS_FLOOR)
    if n2 != n:
        pad = dev_ed.identity((n2 - n,))
        flat = PointArray(*(
            jnp.concatenate([c, pc], axis=0) for c, pc in zip(flat, pad)))
    s = np.asarray(compress(flat))[:n]
    return [row.tobytes() for row in s.astype("<u2")]


def decompress_from_bytes(blobs: list[bytes]) -> PointArray:
    """Host-side batch decode -> device PointArray; raises ValueError on
    any invalid encoding (mirrors ProofVerifyError::DecompressionError)."""
    from ..curve import edwards as dev_ed

    pts = []
    for b in blobs:
        pt = host_ri.decode(b)
        if pt is None:
            raise ValueError(f"ristretto decompression failed: {b.hex()}")
        pts.append(pt)
    return dev_ed.from_host(pts)
