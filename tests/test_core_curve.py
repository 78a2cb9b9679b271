"""Host curve/ristretto validation against RFC 9496 test vectors and
group-law identities (the oracle everything else is tested against)."""

import hashlib

from spartan_tpu.core import field
from spartan_tpu.core.edwards import BASEPOINT, Point, msm
from spartan_tpu.core.ristretto import (
    decode,
    encode,
    from_uniform_bytes,
)

# RFC 9496 Appendix A.1: encodings of B, 2B, ..., the first multiples.
SMALL_MULTIPLES = [
    "0000000000000000000000000000000000000000000000000000000000000000",
    "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76",
    "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
    "94741f5d5d52755ece4f23f044ee27d5d1ea1e2bd196b462166b16152a9d0259",
    "da80862773358b466ffadfe0b3293ab3d9fd53c5ea6c955358f568322daf6a57",
    "e882b131016b52c1d3337080187cf768423efccbb517bb495ab812c4160ff44e",
    "f64746d3c92b13050ed8d80236a7f0007c3b3f962f5ba793d19a601ebb1df403",
    "44f53520926ec81fbd5a387845beb7df85a96a24ece18738bdcfa6a7822a176d",
    "903293d8f2287ebe10e2374dc1a53e0bc887e592699f02d077d5263cdd55601c",
    "02622ace8f7303a31cafc63f8fc48fdc16e1c8c8d234b2f0d6685282a9076031",
    "20706fd788b2720a1ed2a5dad4952b01f413bcf0e7564de8cdc816689e2db95f",
    "bce83f8ba5dd2fa572864c24ba1810f9522bc6004afe95877ac73241cafdab42",
    "e4549ee16b9aa03099ca208c67adafcafa4c3f3e4e5303de6026e3ca8ff84460",
    "aa52e000df2e16f55fb1032fc33bc42742dad6bd5a8fc0be0167436c5948501f",
    "46376b80f409b29dc2b5f6f0c52591990896e5716f41477cd30085ab7f10301e",
    "e0c418f7c8d9c4cdd7395b93ea124f3ad99021bb681dfc3302a9d99a2e53e64e",
]


def test_small_multiples_of_basepoint():
    acc = Point.identity()
    for i, expect in enumerate(SMALL_MULTIPLES):
        assert encode(acc).hex() == expect, f"multiple {i}"
        assert encode(BASEPOINT.mul(i)).hex() == expect
        acc = acc.add(BASEPOINT)


def test_decode_roundtrip_and_invalid():
    for i in range(1, 16):
        b = bytes.fromhex(SMALL_MULTIPLES[i])
        pt = decode(b)
        assert pt is not None
        assert encode(pt) == b
    # non-canonical field element -> reject
    assert decode(b"\xff" * 32) is None
    # negative s -> reject (s odd)
    assert decode((1).to_bytes(32, "little")) is None


def test_one_way_map_rfc_vector():
    # RFC 9496 Appendix A.2 (one-way map): first input/output pair.
    uniform = bytes.fromhex(
        "5d1be09e3d0c82fc538112490e35701979d99e06ca3e2b5b54bffe8b4dc772c1"
        "4d98b696a1bbfb5ca32c436cc61c16563790306c79eaca7705668b47dffe5bb6"
    )
    pt = from_uniform_bytes(uniform)
    assert encode(pt).hex() == (
        "3066f82a1a747d45120d1740f14358531a8f04bbffe6a819f86dfe50f44a0a46"
    )


def test_group_laws():
    a = from_uniform_bytes(hashlib.sha512(b"gen-a").digest())
    b = from_uniform_bytes(hashlib.sha512(b"gen-b").digest())
    # commutativity / associativity via encodings
    assert encode(a.add(b)) == encode(b.add(a))
    assert encode(a.add(b).add(a)) == encode(a.double().add(b))
    # identity & inverse
    assert encode(a.add(Point.identity())) == encode(a)
    assert encode(a.add(a.neg())) == encode(Point.identity())
    # order: q * P = identity
    assert encode(a.mul(field.Q)) == encode(Point.identity())


def test_msm_matches_naive():
    gens = [
        from_uniform_bytes(hashlib.sha512(bytes([i])).digest()) for i in range(5)
    ]
    scalars = [(i * 7919 + 13) % field.Q for i in range(5)]
    lhs = msm(scalars, gens)
    rhs = Point.identity()
    for s, g in zip(scalars, gens):
        rhs = rhs.add(g.mul(s))
    assert encode(lhs) == encode(rhs)


def test_field_sqrt_and_invariants():
    p = field.P25519
    assert field.SQRT_M1 * field.SQRT_M1 % p == p - 1
    ok, r = field.sqrt_ratio_m1(4, 1)
    assert ok and r * r % p == 4
    ok, _ = field.sqrt_ratio_m1(2, 1)  # 2 is a non-residue mod p
    assert not ok
    assert field.batch_inv([3, 5, 7], field.Q) == [
        field.finv(3, field.Q),
        field.finv(5, field.Q),
        field.finv(7, field.Q),
    ]
