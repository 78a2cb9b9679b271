"""DeviceTranscript vs host merlin Transcript: byte-exact equality on
a representative Spartan label schedule."""

import numpy as np
import jax.numpy as jnp

from spartan_tpu.core.field import Q
from spartan_tpu.core.keccak import keccak_f1600_bytes
from spartan_tpu.core.merlin import Transcript
from spartan_tpu.ff import fq, limb
from spartan_tpu.transcript import device as dtx

import pytest

pytestmark = pytest.mark.mid  # XLA-compile-heavy: run via -m mid (default tier is host-path + golden)


def test_device_keccak_matches_host():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=200).astype(np.uint32)
    lo, hi = dtx._bytes_to_lanes(jnp.asarray(raw))
    lo, hi = dtx.keccak_f1600_device(lo, hi)
    got = np.asarray(dtx._lanes_to_bytes(lo, hi)).astype(np.uint8)

    st = bytearray(raw.astype(np.uint8).tobytes())
    keccak_f1600_bytes(st)
    assert bytes(got.tobytes()) == bytes(st)


def _mont(x: int) -> jnp.ndarray:
    return fq.to_mont(jnp.asarray(limb.int_to_limbs(x % Q)))


def test_device_transcript_matches_host():
    h = Transcript(b"test label")
    d = dtx.DeviceTranscript(b"test label")

    h.append_protocol_name(b"proto")
    d.append_protocol_name(b"proto")
    h.append_u64(b"n", 12345)
    d.append_u64(b"n", 12345)

    xs = [7, 1 << 200, Q - 1, 0]
    for x in xs:
        h.append_scalar(b"x", x)
        d.append_scalar(b"x", _mont(x))

    h.append_scalar_vector(b"v", xs)
    d.append_scalar_vector(b"v", jnp.stack([_mont(x) for x in xs]))

    pt = bytes(range(32))
    h.append_point(b"p", pt)
    d.append_point(b"p", pt)

    # long message crossing several rate blocks
    h.append_message(b"blob", b"z" * 700)
    d.append_message(b"blob", b"z" * 700)

    for _ in range(3):
        ch = h.challenge_scalar(b"c")
        cd = d.challenge_scalar(b"c")
        assert fq.decode_to_ints(cd[None])[0] == ch

    # interleave more appends after challenges
    h.append_scalar(b"y", ch)
    d.append_scalar(b"y", _mont(ch))
    assert h.challenge_scalar(b"f") == fq.decode_to_ints(
        d.challenge_scalar(b"f")[None])[0]


def test_device_transcript_from_to_host():
    h = Transcript(b"lift")
    h.append_scalar(b"a", 42)

    d = dtx.DeviceTranscript.from_host(h)
    d.append_scalar(b"b", _mont(77))
    ch_d = fq.decode_to_ints(d.challenge_scalar(b"c")[None])[0]

    # mirror on a pure-host transcript
    h2 = Transcript(b"lift")
    h2.append_scalar(b"a", 42)
    h2.append_scalar(b"b", 77)
    assert ch_d == h2.challenge_scalar(b"c")

    # write back and continue on host
    h3 = Transcript(b"lift")
    d.to_host(h3)
    h2b = h2  # already consumed challenge c
    assert h3.challenge_scalar(b"g") == h2b.challenge_scalar(b"g")


def test_streamed_scalar_vector_matches_host():
    """The streamed append_scalar_vector (k >= 8) is byte-identical."""
    h = Transcript(b"stream")
    d = dtx.DeviceTranscript(b"stream")
    xs = [i * 7919 + 3 for i in range(20)] + [0, Q - 1]
    h.append_scalar_vector(b"vec", xs)
    d.append_scalar_vector(b"vec", jnp.stack([_mont(x) for x in xs]))
    assert h.challenge_scalar(b"c") == fq.decode_to_ints(
        d.challenge_scalar(b"c")[None])[0]
    # interleave and repeat with a vector crossing many rate blocks
    xs2 = list(range(100))
    h.append_scalar_vector(b"v2", xs2)
    d.append_scalar_vector(b"v2", jnp.stack([_mont(x) for x in xs2]))
    assert h.challenge_scalar(b"c2") == fq.decode_to_ints(
        d.challenge_scalar(b"c2")[None])[0]
