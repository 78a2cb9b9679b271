"""Pallas windowed row-MSM kernel vs the host oracle.

Two tiers:
  * fast — the kernel's lazy fixed-height field ops (_FpLazy) checked
    directly against python-int arithmetic (pltpu.roll substituted
    with jnp.roll via the _roll indirection), including the maximal
    lazy values.  These are the only nontrivial math in the kernel;
    the rest (select tree, halving tree) is data movement.
  * slow — full msm_rows_pallas in interpret mode (the whole grid
    unrolls into one XLA graph: minutes of local LLVM).  The compiled
    Mosaic path is exercised on real hardware by
    artifacts/probe_pallas_tpu.py (committed logs) and bench runs.
(ref parity: group.rs:98-117, dense_mlpoly.rs:148-162)"""

import hashlib
import random

import numpy as np
import pytest
import jax.numpy as jnp

from spartan_tpu.core import ristretto as hri
from spartan_tpu.core.edwards import Point
from spartan_tpu.core.field import Q
from spartan_tpu.curve import edwards as ed
from spartan_tpu.curve import pallas_msm
from spartan_tpu.ff import limb

rng = random.Random(0xA110C)


def _rand_points(n):
    return [
        hri.from_uniform_bytes(
            hashlib.sha512(b"pp%d" % rng.randrange(1 << 30)).digest())
        for _ in range(n)
    ]


def _rand_scalars(n):
    special = [0, 1, 2, 15, 16, Q - 1]
    return (special + [rng.randrange(Q) for _ in range(n)])[:n]


def _host_msm(ks, pts):
    acc = Point.identity()
    for k, p in zip(ks, pts):
        acc = acc.add(p.mul(k))
    return hri.encode(acc)


def _check(L, R, LB, RC):
    pts = _rand_points(R)
    gens = ed.from_host(pts)
    ks = _rand_scalars(L * R)
    scal = jnp.asarray(limb.ints_to_limbs(ks)).reshape(L, R, 16)
    got = ed.to_host(pallas_msm.msm_rows_pallas(
        scal, gens, LB=LB, RC=RC, interpret=True))
    for l in range(L):
        want = _host_msm(ks[l * R:(l + 1) * R], pts)
        assert hri.encode(got[l]) == want, f"row {l} (L={L},R={R})"


@pytest.mark.slow
def test_pallas_msm_rows_tiny():
    _check(L=4, R=16, LB=4, RC=16)


@pytest.mark.slow
def test_pallas_msm_rows_row_pad_and_laneblocks():
    # L=3 exercises the LB row padding; RC=8 < R=32 exercises the
    # lane-block grid axis + the XLA-side lane-block point reduction
    _check(L=3, R=32, LB=2, RC=8)


@pytest.mark.slow
def test_pallas_msm_rows_lane_pad():
    # R=24 is not a multiple of RC: identity-point lane padding
    _check(L=2, R=24, LB=2, RC=16)


@pytest.mark.slow
def test_pallas_msm_rows_nonpow2_laneblocks():
    # R=20, RC=8 -> ceil(R/RC)=3 lane blocks: must pad to 4 (a power
    # of two) or the halving reduction drops block 2 (ADVICE r3 high)
    _check(L=2, R=20, LB=2, RC=8)


@pytest.mark.parametrize("nblk", [2, 3, 5, 6])
def test_reduce_laneblocks_any_width(nblk):
    # _reduce_laneblocks must sum ALL lane blocks for any width, not
    # just powers of two (regression: nblk=3 silently returned b0+b1)
    pts = _rand_points(nblk)
    gens = ed.from_host(pts)
    blocks = tuple(c[None, :, None, :] for c in gens)  # (1, nblk, 1, 16)
    out = pallas_msm._reduce_laneblocks(blocks)
    got = ed.to_host(ed.PointArray(*(c.reshape(1, 16) for c in out)))[0]
    want = Point.identity()
    for p in pts:
        want = want.add(p)
    assert hri.encode(got) == hri.encode(want)


# ---------------------------------------------------------------------------
# fast tier: _FpLazy vs python ints
# ---------------------------------------------------------------------------

from spartan_tpu.core.field import P25519 as _P
from spartan_tpu.curve import pallas_msm as _pm

pytestmark = pytest.mark.mid  # XLA-compile-heavy: run via -m mid (default tier is host-path + golden)


def _to_arr(vals, W):
    a = np.zeros((_pm.H, W), np.uint32)
    for w, v in enumerate(vals):
        for i in range(16):
            a[i, w] = (v >> (16 * i)) & 0xFFFF
    return jnp.asarray(a)


def _to_ints(arr, W):
    a = np.asarray(arr)
    return [sum(int(a[i, w]) << (16 * i) for i in range(_pm.H))
            for w in range(W)]


def test_fplazy_field_ops_vs_python_ints(monkeypatch):
    monkeypatch.setattr(_pm, "_roll",
                        lambda x, k, axis: jnp.roll(x, k, axis))
    W = 4
    f = _pm._FpLazy(jnp.asarray(_pm._CONSTS))
    A = [rng.randrange(1 << 256) for _ in range(W)]
    B = [rng.randrange(1 << 256) for _ in range(W)]
    a, b = _to_arr(A, W), _to_arr(B, W)

    got = _to_ints(f.mul(a, b), W)
    assert [g % _P for g in got] == [(x * y) % _P for x, y in zip(A, B)]
    assert all(g < (1 << 256) for g in got)  # lazy invariant

    got = _to_ints(f.add(a, b), W)
    assert [g % _P for g in got] == [(x + y) % _P for x, y in zip(A, B)]
    got = _to_ints(f.sub(a, b), W)
    assert [g % _P for g in got] == [(x - y) % _P for x, y in zip(A, B)]


def test_fplazy_extremes(monkeypatch):
    monkeypatch.setattr(_pm, "_roll",
                        lambda x, k, axis: jnp.roll(x, k, axis))
    W = 4
    f = _pm._FpLazy(jnp.asarray(_pm._CONSTS))
    M = (1 << 256) - 1  # maximal lazy value
    for A, B in [([M] * W, [M] * W), ([0] * W, [M] * W),
                 ([_P] * W, [_P - 1] * W), ([1] * W, [0] * W)]:
        a, b = _to_arr(A, W), _to_arr(B, W)
        for op, ref in [(f.mul, lambda x, y: x * y),
                        (f.add, lambda x, y: x + y),
                        (f.sub, lambda x, y: x - y)]:
            got = _to_ints(op(a, b), W)
            assert [g % _P for g in got] == \
                [ref(x, y) % _P for x, y in zip(A, B)]
            assert all(g < (1 << 256) for g in got)


def test_padd_vs_host_edwards(monkeypatch):
    """The kernel's unified extended-coords addition vs core.edwards."""
    monkeypatch.setattr(_pm, "_roll",
                        lambda x, k, axis: jnp.roll(x, k, axis))
    from spartan_tpu.core import ristretto as hri
    from spartan_tpu.core.edwards import Point

    W = 2
    f = _pm._FpLazy(jnp.asarray(_pm._CONSTS))
    pts1 = _rand_points(W)
    pts2 = _rand_points(W)

    def pack(pts):
        return tuple(_to_arr([getattr(p, c) for p in pts], W)
                     for c in ("X", "Y", "Z", "T"))

    out = _pm._padd(f, pack(pts1), pack(pts2))
    ox, oy, oz, ot = (_to_ints(c, W) for c in out)
    for w in range(W):
        want = pts1[w].add(pts2[w])
        got = Point(ox[w] % _P, oy[w] % _P, oz[w] % _P, ot[w] % _P)
        assert hri.encode(got) == hri.encode(want)
