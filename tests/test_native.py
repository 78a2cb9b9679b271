"""Native C++ host-crypto vs pure-Python differential tests.

The native library (spartan_tpu/native/host_crypto.cpp) must be
byte-identical to the Python implementations in spartan_tpu.core —
this is the dual-implementation cross-check pattern the reference uses
for its field layer (SURVEY.md §4)."""

import ctypes
import hashlib
import os
import random

import pytest

from spartan_tpu import native
from spartan_tpu.core.edwards import BASEPOINT, Point, msm
from spartan_tpu.core.field import Q, P25519
from spartan_tpu.core import ristretto as hri
from spartan_tpu.core.keccak import keccak_f1600_bytes
from spartan_tpu.core.strobe import Strobe128, _Strobe128Native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable")


def _py_mul(p: Point, k: int) -> Point:
    acc = Point.identity()
    add = p
    while k:
        if k & 1:
            acc = acc.add(add)
        add = add.double()
        k >>= 1
    return acc


def test_keccak_parity():
    rng = random.Random(0)
    st = bytearray(rng.randbytes(200))
    st2 = bytearray(st)
    keccak_f1600_bytes(st)
    buf = ctypes.create_string_buffer(bytes(st2), 200)
    native.get_lib().spartan_keccak_f1600(buf)
    assert bytes(st) == buf.raw[:200]


def test_strobe_parity():
    a = Strobe128(b"proto")
    b = _Strobe128Native(b"proto")
    ops = [
        ("meta_ad", b"label"), ("ad", b"x" * 500), ("meta_ad", b"m"),
        ("key", b"k" * 32), ("ad", b""),
    ]
    for name, data in ops:
        getattr(a, name)(data, False)
        getattr(b, name)(data, False)
    assert a.prf(333, False) == b.prf(333, False)
    a.ad(b"tail", False)
    b.ad(b"tail", False)
    assert a.prf(64, False) == b.prf(64, False)


def test_scalar_mul_parity():
    rng = random.Random(1)
    for _ in range(8):
        k = rng.randrange(Q)
        assert BASEPOINT.mul(k).eq_ristretto(_py_mul(BASEPOINT, k))
    # edge scalars
    for k in (0, 1, 2, Q - 1, 2**256 - 1):
        assert BASEPOINT.mul(k).eq_ristretto(_py_mul(BASEPOINT, k % 2**256))


def test_codec_parity_and_validation():
    rng = random.Random(2)
    for i in range(24):
        pt = hri.from_uniform_bytes(hashlib.sha512(b"cp%d" % i).digest())
        e = hri.encode(pt)
        d = hri.decode(e)
        assert d is not None and d.eq_ristretto(pt)
    # non-canonical / invalid encodings rejected
    assert hri.decode(b"\xff" * 32) is None
    assert hri.decode((P25519 + 2).to_bytes(32, "little")) is None
    assert hri.decode((1).to_bytes(32, "little")) is None  # negative-odd s
    assert hri.decode(bytes(32)) is not None  # identity


def test_msm_parity():
    rng = random.Random(3)
    pts = [hri.from_uniform_bytes(hashlib.sha512(b"mp%d" % i).digest())
           for i in range(60)]
    ks = [rng.randrange(Q) for _ in range(60)]
    want = Point.identity()
    for k, p in zip(ks, pts):
        want = want.add(_py_mul(p, k))
    got = msm(ks, pts)
    assert hri.encode(got) == hri.encode(want)
    # empty and zero-scalar cases
    assert hri.encode(msm([], [])) == hri.encode(Point.identity())
    assert hri.encode(msm([0] * 4, pts[:4])) == hri.encode(Point.identity())


def test_msm_signed_digit_boundaries():
    """The round-4 Pippenger recodes scalars into signed digits in
    [-2^(c-1), 2^(c-1)]; exercise every boundary pattern at pinned
    window widths, incl. the max 256-bit value (group.rs:98-117 is
    vartime over arbitrary 256-bit inputs)."""
    pts = [hri.from_uniform_bytes(hashlib.sha512(b"sb%d" % i).digest())
           for i in range(8)]
    for c in (2, 8, 14):
        half = 1 << (c - 1)
        ks = [half, half - 1, half + 1, (1 << c) - 1,
              sum(half << (c * w) for w in range(256 // c)),  # all-carry
              Q - 1, (1 << 252), (1 << 256) - 1]
        want = Point.identity()
        for k, p in zip(ks, pts):
            want = want.add(_py_mul(p, k))
        os.environ["SPARTAN_TPU_HOST_MSM_C"] = str(c)
        try:
            got = msm(ks, pts)
        finally:
            del os.environ["SPARTAN_TPU_HOST_MSM_C"]
        assert hri.encode(got) == hri.encode(want), f"c={c}"


def test_from_uniform_parity():
    # native elligator vs python elligator on fixed inputs
    lib = native.get_lib()
    for i in range(12):
        b = hashlib.sha512(b"unif%d" % i).digest()
        out = ctypes.create_string_buffer(128)
        lib.spartan_ristretto_from_uniform(bytes(b), out)
        got = Point._from_blob(out.raw)
        mask = (1 << 255) - 1
        t0 = (int.from_bytes(b[:32], "little") & mask) % P25519
        t1 = (int.from_bytes(b[32:], "little") & mask) % P25519
        want = hri.elligator_map(t0).add(hri.elligator_map(t1))
        assert got.eq_ristretto(want)


def test_ct_msm_matches_vartime():
    """Constant-time ladder (spartan_ge_msm_ct) vs the vartime paths:
    identical group elements for random scalars, zero, and q-1 edge
    cases (VERDICT r4 #6: CT path for blind-bearing commitments)."""
    from spartan_tpu.core.edwards import msm_ct

    rng = random.Random(77)
    pts = [hri.from_uniform_bytes(hashlib.sha512(b"ctp%d" % i).digest())
           for i in range(5)]
    for trial in range(6):
        ks = [rng.randrange(Q) for _ in pts]
        if trial == 4:
            ks[0], ks[1] = 0, Q - 1
        if trial == 5:
            ks = [0] * len(pts)
        want = msm(ks, pts)
        got = msm_ct(ks, pts)
        assert hri.encode(got) == hri.encode(want), f"trial={trial}"
    # single-point CT scalarmul against the python ladder
    lib = native.get_lib()
    for i in range(4):
        k = rng.randrange(Q)
        out = ctypes.create_string_buffer(128)
        lib.spartan_ge_scalarmul_ct(
            pts[i]._blob(), k.to_bytes(32, "little"), out)
        assert Point._from_blob(out.raw).eq_ristretto(_py_mul(pts[i], k))
