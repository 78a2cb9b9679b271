"""Device-resident merlin transcript (keccak-f[1600] + STROBE-128 as
traced JAX ops).

Why this exists: Fiat-Shamir makes every sumcheck round depend on a
challenge derived from the previous round's commitment, which in a
host-driven loop costs one device->host fetch per round — ~32 ms over
this environment's TPU tunnel, dwarfing the ~0.1 ms of round compute.
Every *label and length* in Spartan's transcript schedule is static
(only scalar/point VALUES are data), so the whole STROBE byte machine
can be traced: the sponge state is a (200,) uint32 byte array, the
position counters are Python ints tracked at trace time, and each
absorb/squeeze lowers to static dynamic-update-slices plus a
keccak permutation (a 24-iteration fori_loop on (25,) 64-bit lanes
held as two uint32 arrays).  An entire sumcheck phase then compiles to
ONE XLA program with zero host round-trips.

Byte-compatible with core.merlin.Transcript (same proofs, same
verifier); differential-tested in tests/test_device_transcript.py.

reference: src/transcript.rs (label schedule), merlin crate (STROBE).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.field import Q
from ..ff import fq, limb

STROBE_R = 166

FLAG_I = 1
FLAG_A = 1 << 1
FLAG_C = 1 << 2
FLAG_M = 1 << 4
FLAG_K = 1 << 5

MERLIN_PROTOCOL_LABEL = b"Merlin v1.0"

_RC = np.array([
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
], dtype=np.uint64)
_RC_LO = jnp.asarray((_RC & 0xFFFFFFFF).astype(np.uint32))
_RC_HI = jnp.asarray((_RC >> 32).astype(np.uint32))

# per-lane rotation offsets for the combined rho+pi step, lane order
# b[y + 5*((2x+3y) % 5)] = rol(a[x + 5y], ROT[x][y])
_ROT_XY = np.array([
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
], dtype=np.int64)
_SRC = np.zeros(25, dtype=np.int64)  # source lane for output position
_ROTN = np.zeros(25, dtype=np.int64)
for _x in range(5):
    for _y in range(5):
        _SRC[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _x + 5 * _y
        _ROTN[_y + 5 * ((2 * _x + 3 * _y) % 5)] = _ROT_XY[_x][_y]
_SRC_J = jnp.asarray(_SRC, dtype=jnp.int32)
_ROTN_J = jnp.asarray(_ROTN.astype(np.uint32))


def _rol64(lo: jnp.ndarray, hi: jnp.ndarray, n: jnp.ndarray):
    """Rotate (25,) 64-bit lanes left by per-lane amounts n (0..63)."""
    n = n % 64
    swap = n >= 32
    lo_, hi_ = jnp.where(swap, hi, lo), jnp.where(swap, lo, hi)
    k = jnp.where(swap, n - 32, n).astype(jnp.uint32)
    # rol32-pair: (hi_:lo_) << k with cross-carry, k in 0..31
    kc = (32 - k) % 32
    nz = (k != 0).astype(jnp.uint32)
    new_lo = (lo_ << k) | nz * (hi_ >> kc)
    new_hi = (hi_ << k) | nz * (lo_ >> kc)
    return new_lo, new_hi


def keccak_f1600_device(lo: jnp.ndarray, hi: jnp.ndarray):
    """(25,) uint32 x2 (lane = hi<<32 | lo) -> permuted lanes."""

    def round_fn(i, state):
        lo, hi = state
        # theta
        l5 = lo.reshape(5, 5)
        h5 = hi.reshape(5, 5)
        clo = l5[0] ^ l5[1] ^ l5[2] ^ l5[3] ^ l5[4]
        chi = h5[0] ^ h5[1] ^ h5[2] ^ h5[3] ^ h5[4]
        rlo, rhi = _rol64(
            jnp.roll(clo, -1), jnp.roll(chi, -1),
            jnp.ones(5, jnp.uint32))
        dlo = jnp.roll(clo, 1) ^ rlo
        dhi = jnp.roll(chi, 1) ^ rhi
        lo = (l5 ^ dlo[None, :]).reshape(25)
        hi = (h5 ^ dhi[None, :]).reshape(25)
        # rho + pi (gather + per-lane rotate)
        blo, bhi = _rol64(lo[_SRC_J], hi[_SRC_J], _ROTN_J)
        # chi
        b5l = blo.reshape(5, 5)
        b5h = bhi.reshape(5, 5)
        lo = (b5l ^ ((~jnp.roll(b5l, -1, axis=1)) & jnp.roll(b5l, -2, axis=1))).reshape(25)
        hi = (b5h ^ ((~jnp.roll(b5h, -1, axis=1)) & jnp.roll(b5h, -2, axis=1))).reshape(25)
        # iota
        lo = lo.at[0].set(lo[0] ^ _RC_LO[i])
        hi = hi.at[0].set(hi[0] ^ _RC_HI[i])
        return lo, hi

    return lax.fori_loop(0, 24, round_fn, (lo, hi))


def _bytes_to_lanes(state_bytes: jnp.ndarray):
    """(200,) uint32 byte values -> (25,) lo/hi uint32 lanes."""
    b = state_bytes.reshape(25, 8)
    lo = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
    hi = b[:, 4] | (b[:, 5] << 8) | (b[:, 6] << 16) | (b[:, 7] << 24)
    return lo, hi


def _lanes_to_bytes(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    cols = []
    for k in range(4):
        cols.append((lo >> (8 * k)) & 0xFF)
    for k in range(4):
        cols.append((hi >> (8 * k)) & 0xFF)
    return jnp.stack(cols, axis=1).reshape(200)


def _permute_bytes(state_bytes: jnp.ndarray) -> jnp.ndarray:
    lo, hi = _bytes_to_lanes(state_bytes)
    lo, hi = keccak_f1600_device(lo, hi)
    return _lanes_to_bytes(lo, hi)


def _const_bytes(data: bytes) -> jnp.ndarray:
    return jnp.asarray(np.frombuffer(data, dtype=np.uint8).astype(np.uint32))


def scalar_to_bytes32(x_mont: jnp.ndarray) -> jnp.ndarray:
    """(16,) Montgomery limbs -> (32,) canonical little-endian byte
    values (uint32 in 0..255), on device."""
    canon = fq.from_mont(x_mont)
    lo = canon & 0xFF
    hi = (canon >> 8) & 0xFF
    return jnp.stack([lo, hi], axis=-1).reshape(32)


def bytes64_to_scalar_mont(b: jnp.ndarray) -> jnp.ndarray:
    """(64,) uint32 byte values -> Montgomery (16,) limbs of
    int(b) mod q (from_bytes_wide, transcript.rs:26-30)."""
    pairs = b.reshape(32, 2)
    limbs = pairs[:, 0] | (pairs[:, 1] << 8)  # (32,) 16-bit limbs
    return fq.to_mont(fq.reduce_wide(limbs))


class DeviceTranscript:
    """Traced merlin transcript.  API mirrors core.merlin.Transcript,
    but message payloads may be device arrays; the state is a traced
    (200,) uint32 array and pos/flags are trace-time Python ints.

    Use inside a jit (or build once and pass .state through a loop):
    every method mutates self.state functionally.
    """

    __slots__ = ("state", "pos", "pos_begin", "cur_flags")

    def __init__(self, label: bytes | None, _state=None,
                 _pos: int = 0, _pos_begin: int = 0, _flags: int = 0):
        if _state is not None:
            self.state = _state
            self.pos = _pos
            self.pos_begin = _pos_begin
            self.cur_flags = _flags
            return
        init = np.zeros(200, dtype=np.uint32)
        init[0:6] = [1, STROBE_R + 2, 1, 0, 1, 96]
        init[6:18] = np.frombuffer(b"STROBEv1.0.2", dtype=np.uint8)
        self.state = _permute_bytes(jnp.asarray(init))
        self.pos = 0
        self.pos_begin = 0
        self.cur_flags = 0
        self._meta_ad(MERLIN_PROTOCOL_LABEL, False)
        self.append_message(b"dom-sep", label)

    # -- host-side snapshot/restore (for crossing jit boundaries) -----

    def pack(self):
        return self.state, (self.pos, self.pos_begin, self.cur_flags)

    @staticmethod
    def unpack(state, meta) -> "DeviceTranscript":
        pos, pos_begin, flags = meta
        return DeviceTranscript(None, _state=state, _pos=pos,
                                _pos_begin=pos_begin, _flags=flags)

    @staticmethod
    def from_host(t) -> "DeviceTranscript":
        """Lift a host core.merlin.Transcript (native or python strobe)
        into a device transcript."""
        s = t.strobe
        if hasattr(s, "buf"):  # native
            raw = bytes(s.buf)
            state, pos, pos_begin, flags = (
                raw[:200], raw[200], raw[201], raw[202])
        else:
            state, pos, pos_begin, flags = (
                bytes(s.state), s.pos, s.pos_begin, s.cur_flags)
        arr = jnp.asarray(np.frombuffer(state, dtype=np.uint8).astype(np.uint32))
        return DeviceTranscript(None, _state=arr, _pos=pos,
                                _pos_begin=pos_begin, _flags=flags)

    def to_host(self, t) -> None:
        """Write this transcript's state back into a host Transcript
        (ONE fetch).  `t` is a core.merlin.Transcript."""
        state = bytes(np.asarray(self.state).astype(np.uint8).tobytes())
        s = t.strobe
        if hasattr(s, "buf"):
            s.buf[:200] = state
            s.buf[200] = self.pos
            s.buf[201] = self.pos_begin
            s.buf[202] = self.cur_flags
        else:
            s.state = bytearray(state)
            s.pos = self.pos
            s.pos_begin = self.pos_begin
            s.cur_flags = self.cur_flags

    # -- strobe internals (pos is python; data is device or bytes) ----

    def _run_f(self):
        st = self.state
        st = st.at[self.pos].set(st[self.pos] ^ self.pos_begin)
        st = st.at[self.pos + 1].set(st[self.pos + 1] ^ 0x04)
        st = st.at[STROBE_R + 1].set(st[STROBE_R + 1] ^ 0x80)
        self.state = _permute_bytes(st)
        self.pos = 0
        self.pos_begin = 0

    def _absorb(self, data):
        """data: (n,) uint32 byte values (device) or python bytes."""
        if isinstance(data, (bytes, bytearray)):
            data = _const_bytes(bytes(data))
        n = int(data.shape[0])
        i = 0
        while i < n:
            take = min(n - i, STROBE_R - self.pos)
            seg = lax.dynamic_slice(data, (i,), (take,))
            cur = lax.dynamic_slice(self.state, (self.pos,), (take,))
            self.state = lax.dynamic_update_slice(
                self.state, cur ^ seg, (self.pos,))
            self.pos += take
            i += take
            if self.pos == STROBE_R:
                self._run_f()

    def _squeeze(self, n: int) -> jnp.ndarray:
        out = []
        got = 0
        while got < n:
            take = min(n - got, STROBE_R - self.pos)
            seg = lax.dynamic_slice(self.state, (self.pos,), (take,))
            out.append(seg)
            self.state = lax.dynamic_update_slice(
                self.state, jnp.zeros(take, jnp.uint32), (self.pos,))
            self.pos += take
            got += take
            if self.pos == STROBE_R:
                self._run_f()
        return jnp.concatenate(out) if len(out) > 1 else out[0]

    def _begin_op(self, flags: int, more: bool):
        if more:
            assert self.cur_flags == flags
            return
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        self._absorb(bytes([old_begin, flags]))
        if (flags & (FLAG_C | FLAG_K)) and self.pos != 0:
            self._run_f()

    def _meta_ad(self, data, more: bool):
        self._begin_op(FLAG_M | FLAG_A, more)
        self._absorb(data)

    def _ad(self, data, more: bool):
        self._begin_op(FLAG_A, more)
        self._absorb(data)

    def _prf(self, n: int, more: bool) -> jnp.ndarray:
        self._begin_op(FLAG_I | FLAG_A | FLAG_C, more)
        return self._squeeze(n)

    # -- merlin + Spartan schedule (transcript.rs:5-63) ----------------

    def append_message(self, label: bytes, message):
        """message: bytes or (n,) uint32 device byte values."""
        if isinstance(message, (bytes, bytearray)):
            mlen = len(message)
        else:
            mlen = int(message.shape[0])
        self._meta_ad(label, False)
        self._meta_ad(mlen.to_bytes(4, "little"), True)
        self._ad(message, False)

    def append_protocol_name(self, name: bytes):
        self.append_message(b"protocol-name", name)

    def append_u64(self, label: bytes, x: int):
        self.append_message(label, x.to_bytes(8, "little"))

    def append_scalar(self, label: bytes, x_mont: jnp.ndarray):
        """x_mont: (16,) Montgomery limbs on device."""
        self.append_message(label, scalar_to_bytes32(x_mont))

    def append_point(self, label: bytes, point_bytes):
        """point_bytes: (32,) uint32 device byte values (compressed
        ristretto) or host bytes."""
        self.append_message(label, point_bytes)

    def _run_f_with(self, pb: int):
        """_run_f with an explicit pos_begin pad value (streamed path)."""
        st = self.state
        st = st.at[self.pos].set(st[self.pos] ^ pb)
        st = st.at[self.pos + 1].set(st[self.pos + 1] ^ 0x04)
        st = st.at[STROBE_R + 1].set(st[STROBE_R + 1] ^ 0x80)
        self.state = _permute_bytes(st)
        self.pos = 0

    def _absorb_stream_ops(self, ops):
        """Absorb a long schedule of interleaved strobe begin-ops and
        payloads as ONE concatenated stream: semantically identical to
        sequential _begin_op/_absorb calls (A / M|A ops only — no C/K
        flushes), but lowers to one dynamic-update-slice per rate chunk
        instead of one per tiny segment.  ops: ('hdr', flags) |
        ('data', bytes | (k,) uint32 device array)."""
        pieces = []          # stream pieces in order
        flush_pbs = []       # pos_begin value at each rate flush
        sim = self.pos
        pb = self.pos_begin
        last_flags = self.cur_flags

        def advance(k: int):
            nonlocal sim, pb
            rem = k
            while rem > 0:
                take = min(rem, STROBE_R - sim)
                sim += take
                rem -= take
                if sim == STROBE_R:
                    flush_pbs.append(pb)
                    sim = 0
                    pb = 0

        for kind, val in ops:
            if kind == "hdr":
                hdr = bytes([pb, val])
                pb = sim + 1
                last_flags = val
                pieces.append(_const_bytes(hdr))
                advance(2)
            else:
                if isinstance(val, (bytes, bytearray)):
                    val = _const_bytes(bytes(val))
                pieces.append(val)
                advance(int(val.shape[0]))

        data = jnp.concatenate(pieces) if len(pieces) > 1 else pieces[0]
        n = int(data.shape[0])
        i = 0
        fi = 0
        while i < n:
            take = min(n - i, STROBE_R - self.pos)
            seg = lax.dynamic_slice(data, (i,), (take,))
            cur = lax.dynamic_slice(self.state, (self.pos,), (take,))
            self.state = lax.dynamic_update_slice(
                self.state, cur ^ seg, (self.pos,))
            self.pos += take
            i += take
            if self.pos == STROBE_R:
                self._run_f_with(flush_pbs[fi])
                fi += 1
        assert self.pos == sim and fi == len(flush_pbs)
        self.pos_begin = pb
        self.cur_flags = last_flags

    def append_scalar_vector(self, label: bytes, xs_mont: jnp.ndarray):
        """(k, 16) Montgomery limbs.  Large vectors stream through one
        concatenated absorb (byte-identical to the per-element path)."""
        k = xs_mont.shape[0]
        if k < 8:
            self.append_message(label, b"begin_append_vector")
            for i in range(k):
                self.append_scalar(label, xs_mont[i])
            self.append_message(label, b"end_append_vector")
            return
        len4 = (32).to_bytes(4, "little")
        # batch the Montgomery->bytes conversion once for all rows
        canon = fq.from_mont(xs_mont)
        lo = canon & 0xFF
        hi = (canon >> 8) & 0xFF
        all_bytes = jnp.stack([lo, hi], axis=-1).reshape(k, 32)
        ops = [("hdr", FLAG_M | FLAG_A), ("data", label),
               ("data", len(b"begin_append_vector").to_bytes(4, "little"))]
        # ^ meta_ad(label) + meta_ad(len, more=True) share one begin-op
        ops += [("hdr", FLAG_A), ("data", b"begin_append_vector")]
        for i in range(k):
            ops += [("hdr", FLAG_M | FLAG_A), ("data", label),
                    ("data", len4),
                    ("hdr", FLAG_A), ("data", all_bytes[i])]
        ops += [("hdr", FLAG_M | FLAG_A), ("data", label),
                ("data", len(b"end_append_vector").to_bytes(4, "little")),
                ("hdr", FLAG_A), ("data", b"end_append_vector")]
        self._absorb_stream_ops(ops)

    def challenge_bytes(self, label: bytes, n: int) -> jnp.ndarray:
        self._meta_ad(label, False)
        self._meta_ad(n.to_bytes(4, "little"), True)
        return self._prf(n, False)

    def challenge_scalar(self, label: bytes) -> jnp.ndarray:
        """-> (16,) Montgomery limbs of the challenge."""
        return bytes64_to_scalar_mont(self.challenge_bytes(label, 64))

    def challenge_vector(self, label: bytes, n: int) -> list:
        return [self.challenge_scalar(label) for _ in range(n)]
