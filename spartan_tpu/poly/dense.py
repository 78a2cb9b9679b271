"""Dense multilinear polynomials as device eval tables.

A polynomial over ell variables is its 2^ell-entry Boolean-hypercube
evaluation table, stored as an (n, 16) Fq Montgomery limb array in HBM
(the TPU re-design of reference dense_mlpoly.rs:17-22).  The sumcheck
workhorses — eq-table expansion, top/bot variable binding, matrix-view
bound — are all O(n) vectorized field ops.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..core.field import Q
from ..ff import fq, limb


def eq_evals(r: list[int], bitrev: bool = False) -> jnp.ndarray:
    """EqPolynomial::evals (dense_mlpoly.rs:68-84): the 2^ell chi table
    for point r, built by ell doubling steps.  Index bit order: r[0]
    pairs with the MOST significant index bit.  Returns Montgomery
    limbs (2^ell, 16).

    bitrev=True builds the same table in bit-reversed index layout
    (value of logical index j stored at position rev(j)) — simply by
    consuming r in reverse order, so the layout costs nothing.  Used by
    the shape-stable sumcheck rounds (protocols/sumcheck.py::_evals_br).

    The whole doubling loop is ONE jitted executable per ell — a
    per-step op chain costs ~2*ell dispatches, each a full relay
    round-trip on the tunneled TPU backend."""
    order = list(reversed(r)) if bitrev else list(r)
    r_m = fq.to_mont(jnp.asarray(fq.encode_ints(order)))
    return _eq_evals_jit(r_m, len(order))


@partial(jax.jit, static_argnames=("ell",))
def _eq_evals_jit(r_m: jnp.ndarray, ell: int) -> jnp.ndarray:
    table = fq.to_mont(jnp.asarray(fq.encode_ints([1])))
    for j in range(ell):
        hi = fq.mul(table, r_m[j][None])
        lo = fq.sub(table, hi)
        table = jnp.stack([lo, hi], axis=1).reshape(-1, 16)
    return table


def bitrev_perm(ell: int) -> np.ndarray:
    """perm[p] = bit-reversal of p within ell bits (host, cached).
    Involution: a table T in normal layout satisfies
    T_br = T[perm]; index vectors map as idx_br = perm[idx]."""
    p = _bitrev_perm_cached(ell)
    return p


from functools import lru_cache


@lru_cache(maxsize=32)
def _bitrev_perm_cached(ell: int) -> np.ndarray:
    idx = np.arange(1 << ell, dtype=np.int64)
    out = np.zeros_like(idx)
    for k in range(ell):
        out = (out << 1) | ((idx >> k) & 1)
    out.setflags(write=False)
    return out


def eq_evaluate(r: list[int], rx: list[int]) -> int:
    """eq(r, rx) on host (dense_mlpoly.rs:59-66)."""
    acc = 1
    for a, b in zip(r, rx):
        acc = acc * ((a * b + (1 - a) * (1 - b)) % Q) % Q
    return acc


@jax.jit
def bound_var_top(Z: jnp.ndarray, r_m: jnp.ndarray) -> jnp.ndarray:
    """bound_poly_var_top (dense_mlpoly.rs:215-223): halve the table,
    new[i] = Z[i] + r*(Z[i+n/2] - Z[i]).  r_m: (16,) Montgomery."""
    n = Z.shape[0] // 2
    lo, hi = Z[:n], Z[n:]
    return fq.add(lo, fq.mul(r_m, fq.sub(hi, lo)))


@jax.jit
def bound_var_bot(Z: jnp.ndarray, r_m: jnp.ndarray) -> jnp.ndarray:
    """bound_poly_var_bot (dense_mlpoly.rs:225-233)."""
    lo, hi = Z[0::2], Z[1::2]
    return fq.add(lo, fq.mul(r_m, fq.sub(hi, lo)))


def evaluate(Z: jnp.ndarray, r: list[int]) -> int:
    """Z~(r) in O(n): <eq_evals(r), Z> (dense_mlpoly.rs:236-242)."""
    chis = eq_evals(r)
    assert chis.shape[0] == Z.shape[0]
    d = fq.dot_mod(chis, Z, axis=0)
    return fq.decode_to_ints(d[None])[0]


@jax.jit
def bound_L(Z: jnp.ndarray, L: jnp.ndarray) -> jnp.ndarray:
    """Matrix-view row combination (dense_mlpoly.rs:206-213):
    Z viewed as (L_size, R_size); returns LZ[i] = sum_j L[j] Z[j,i].
    Z: (L_size*R_size, 16); L: (L_size, 16) Montgomery."""
    Ls = L.shape[0]
    Zm = Z.reshape(Ls, -1, 16)
    return fq.sum_mod(fq.mul(Zm, L[:, None, :]), axis=0)


def factored_lens(ell: int) -> tuple[int, int]:
    """compute_factored_lens (dense_mlpoly.rs:86-88)."""
    return ell // 2, ell - ell // 2


def merge_pad(polys: list[jnp.ndarray]) -> jnp.ndarray:
    """DensePolynomial::merge (dense_mlpoly.rs:258-272): concatenate and
    zero-pad to the next power of two."""
    Z = jnp.concatenate(polys, axis=0)
    n = Z.shape[0]
    target = 1 << (n - 1).bit_length() if n > 1 else 1
    if target != n:
        Z = jnp.concatenate(
            [Z, jnp.zeros((target - n, 16), dtype=jnp.uint32)], axis=0
        )
    return Z


# -- host helpers -------------------------------------------------------------

def from_ints(xs: list[int], bitrev: bool = False) -> jnp.ndarray:
    """Canonical ints -> Montgomery device table.  bitrev relayouts on
    the host (fancy-index of the packed limb array) before upload."""
    packed = fq.encode_ints(xs)
    if bitrev:
        n = len(xs)
        ell = (n - 1).bit_length()
        assert n == 1 << ell, "bitrev layout requires a power-of-two table"
        packed = packed[bitrev_perm(ell)]
    return fq.to_mont(jnp.asarray(packed))


def to_ints(Z: jnp.ndarray) -> list[int]:
    return fq.decode_to_ints(Z)


def identity_evals(ell: int) -> list[int]:
    """IdentityPolynomial helper (dense_mlpoly.rs:101-117) — host."""
    return list(range(1 << ell))
