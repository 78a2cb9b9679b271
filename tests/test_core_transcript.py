"""Transcript stack validation: keccak vs hashlib, merlin conformance
vector, and the Spartan label schedule helpers."""

import hashlib

from spartan_tpu.core.keccak import keccak_f1600_bytes
from spartan_tpu.core.merlin import RandomTape, Transcript


def _sha3_256(data: bytes) -> bytes:
    """sha3-256 rebuilt on our permutation; cross-checked with hashlib to
    validate keccak_f1600 end to end."""
    rate = 136
    st = bytearray(200)
    # absorb with SHA3 padding 0x06 ... 0x80
    padded = bytearray(data)
    padded.append(0x06)
    while len(padded) % rate != 0:
        padded.append(0)
    padded[-1] ^= 0x80
    for off in range(0, len(padded), rate):
        for i in range(rate):
            st[i] ^= padded[off + i]
        keccak_f1600_bytes(st)
    return bytes(st[:32])


def test_keccak_permutation_vs_hashlib():
    for msg in [b"", b"abc", b"x" * 200, bytes(range(256)) * 3]:
        assert _sha3_256(msg) == hashlib.sha3_256(msg).digest()


def test_merlin_conformance_vector():
    # The merlin crate's own equivalence test (merlin transcript.rs
    # test_transcript_v_mini_protocol / "comparison with known output").
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    cb = t.challenge_bytes(b"challenge", 32)
    assert cb.hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_challenge_scalar_in_field():
    from spartan_tpu.core.field import Q

    t = Transcript(b"test protocol")
    t.append_protocol_name(b"unit test")
    v = t.challenge_vector(b"c", 8)
    assert all(0 <= x < Q for x in v)
    # deterministic
    t2 = Transcript(b"test protocol")
    t2.append_protocol_name(b"unit test")
    assert t2.challenge_vector(b"c", 8) == v


def test_random_tape_deterministic_with_seed():
    a = RandomTape(b"proof", seed=12345)
    b = RandomTape(b"proof", seed=12345)
    assert a.random_vector(b"x", 4) == b.random_vector(b"x", 4)
