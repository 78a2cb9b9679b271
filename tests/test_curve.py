"""Device curve layer vs host oracle: point ops, compression, MSM."""

import hashlib
import random

import numpy as np
import jax.numpy as jnp

from spartan_tpu.core import ristretto as hri
from spartan_tpu.core.edwards import BASEPOINT, Point
from spartan_tpu.core.field import Q
from spartan_tpu.curve import edwards as ed
from spartan_tpu.curve import msm as msm_mod
from spartan_tpu.curve import ristretto as dri
from spartan_tpu.ff import limb

import pytest

pytestmark = pytest.mark.mid  # XLA-compile-heavy: run via -m mid (default tier is host-path + golden)

rng = random.Random(0xBEEF)


def rand_points(n):
    return [
        hri.from_uniform_bytes(hashlib.sha512(b"pt%d" % rng.randrange(1 << 30)).digest())
        for _ in range(n)
    ]


def rand_scalars(n):
    special = [0, 1, 2, Q - 1]
    return (special + [rng.randrange(Q) for _ in range(n)])[:n]


def test_add_double_vs_host():
    pts_a = rand_points(16)
    pts_b = rand_points(16)
    da, db = ed.from_host(pts_a), ed.from_host(pts_b)
    got = ed.to_host(ed.add(da, db))
    for g, a, b in zip(got, pts_a, pts_b):
        assert hri.encode(g) == hri.encode(a.add(b))
    got2 = ed.to_host(ed.double(da))
    for g, a in zip(got2, pts_a):
        assert hri.encode(g) == hri.encode(a.double())


def test_identity_and_select():
    pts = rand_points(4)
    d = ed.from_host(pts)
    s = ed.add(d, ed.identity((4,)))
    for g, a in zip(ed.to_host(s), pts):
        assert hri.encode(g) == hri.encode(a)


def test_scalar_mul_vs_host():
    pts = rand_points(8)
    ks = rand_scalars(8)
    d = ed.from_host(pts)
    s = jnp.asarray(limb.ints_to_limbs(ks))
    got = ed.to_host(ed.scalar_mul(d, s))
    for g, pt, k in zip(got, pts, ks):
        assert hri.encode(g) == hri.encode(pt.mul(k))


def test_compress_matches_host():
    pts = rand_points(32) + [Point.identity(), BASEPOINT]
    d = ed.from_host(pts)
    blobs = dri.compress_to_bytes(d)
    for blob, pt in zip(blobs, pts):
        assert blob == hri.encode(pt)


def test_sum_reduce():
    pts = rand_points(13)  # odd count exercises padding
    d = ed.from_host(pts)
    got = ed.to_host(ed.sum_reduce(d, axis=0))[0]
    want = Point.identity()
    for pt in pts:
        want = want.add(pt)
    assert hri.encode(got) == hri.encode(want)


def _host_msm(ks, pts):
    acc = Point.identity()
    for k, pt in zip(ks, pts):
        acc = acc.add(pt.mul(k))
    return hri.encode(acc)


def test_msm_naive_vs_host():
    pts = rand_points(8)
    ks = rand_scalars(8)
    d = ed.from_host(pts)
    s = jnp.asarray(limb.ints_to_limbs(ks))
    got = ed.to_host(msm_mod.msm_naive(s, d))[0]
    assert hri.encode(got) == _host_msm(ks, pts)


def test_msm_pippenger_vs_host():
    for n, c in [(32, 8), (33, 8)]:
        pts = rand_points(n)
        ks = rand_scalars(n)
        d = ed.from_host(pts)
        s = jnp.asarray(limb.ints_to_limbs(ks))
        got = ed.to_host(msm_mod.msm(s, d, c=c))[0]
        assert hri.encode(got) == _host_msm(ks, pts), f"n={n} c={c}"


def test_msm_adversarial_digit_patterns():
    # all-equal scalars (single giant run), all zeros, tiny values
    pts = rand_points(32)
    d = ed.from_host(pts)
    for ks in [
        [5] * 32,
        [0] * 32,
        ([0, 0, 1, 1, 2, 2, 0, 0, 7, 7, 7, 7, 0, 0, 0, 1] * 2),
        [Q - 1] * 32,
    ]:
        s = jnp.asarray(limb.ints_to_limbs(ks))
        got = ed.to_host(msm_mod.msm(s, d, c=8))[0]
        assert hri.encode(got) == _host_msm(ks, pts), ks


def test_msm_rows_vs_per_row():
    L, R = 4, 8
    pts = rand_points(R)
    d = ed.from_host(pts)
    ks = [[rng.randrange(Q) for _ in range(R)] for _ in range(L)]
    s = jnp.asarray(np.stack([limb.ints_to_limbs(row) for row in ks]))
    got = ed.to_host(msm_mod.msm_rows(s, d, c=8))
    for j in range(L):
        assert hri.encode(got[j]) == _host_msm(ks[j], pts), f"row {j}"


def test_msm_chunked_equality(monkeypatch):
    """Row-chunked and single-launch MSMs must agree (same group
    elements; compare compressed bytes)."""
    L, R = 8, 32
    pts = rand_points(R)
    gens = ed.from_host(pts)
    scal = jnp.asarray(
        limb.ints_to_limbs(rand_scalars(L * R))).reshape(L, R, 16)

    monkeypatch.setenv("SPARTAN_TPU_MSM_CHUNK", "20")  # no chunking
    want = dri.compress_to_bytes(msm_mod.msm_rows(scal, gens, c=4))
    monkeypatch.setenv("SPARTAN_TPU_MSM_CHUNK", "6")   # 64-pt launches
    got = dri.compress_to_bytes(msm_mod.msm_rows(scal, gens, c=4))
    assert got == want

    flat = scal.reshape(L * R, 16)
    tiled = ed.PointArray(*(jnp.tile(c, (L, 1)) for c in gens))
    monkeypatch.setenv("SPARTAN_TPU_MSM_CHUNK", "20")
    w1 = dri.compress_to_bytes(
        ed.PointArray(*(c[None] for c in msm_mod.msm(flat, tiled, c=4))))
    monkeypatch.setenv("SPARTAN_TPU_MSM_CHUNK", "6")
    g1 = dri.compress_to_bytes(
        ed.PointArray(*(c[None] for c in msm_mod.msm(flat, tiled, c=4))))
    assert g1 == w1
