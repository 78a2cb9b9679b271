"""Generate the miniz deflate-stream fixtures (tests/golden/miniz/).

Run ON A BOX WITH THE VENDORED C MINIZ (torch's libtorch_cpu.so —
miniz 3.0.2, the same tdefl family flate2's rust_backend/miniz_oxide
ports):

    python tests/golden/gen_miniz_fixtures.py

The fixtures pin the exact deflate bytes of (a) a ladder of synthetic
payloads including incompressible high-entropy data (the shape of
bincode'd Montgomery scalars) and (b) the full instance digest for the
R1CS shapes the test matrix uses (cubic example, synthetic n=16 and
n=256).  tests/test_serialize.py::test_miniz_fixtures asserts
byte-for-byte equality, so any environment whose zlib_stream silently
fell back to madler zlib — which emits a different stream for every
nonempty input — fails loudly instead of producing proofs that do not
cross-verify (VERDICT r3 next #8, ADVICE r3 medium).
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

OUT = os.path.join(os.path.dirname(__file__), "miniz")


def _entropy(n: int, seed: bytes) -> bytes:
    """Deterministic incompressible bytes (SHA-512 chain)."""
    out = bytearray()
    block = seed
    while len(out) < n:
        block = hashlib.sha512(block).digest()
        out += block
    return bytes(out[:n])


def payloads():
    yield "empty", b""
    yield "one", b"a"
    yield "text", b"the quick brown fox jumps over the lazy dog" * 40
    yield "zeros_64k", bytes(64 * 1024)
    yield "entropy_4k", _entropy(4 * 1024, b"spartan-miniz-4k")
    # > 31 KB of incompressible data: crosses a stored-block boundary,
    # exercising the mz_compressBound capacity math (ADVICE r3 low)
    yield "entropy_100k", _entropy(100 * 1024, b"spartan-miniz-100k")


def digest_payloads():
    from spartan_tpu.api import Instance
    from examples.cubic import produce_r1cs

    inst, _, _ = produce_r1cs()
    yield "digest_cubic", inst.digest

    for n in (16, 256):
        inst, _, _ = Instance.produce_synthetic_r1cs(n, n, 10, seed=0)
        yield f"digest_synth_{n}", inst.digest


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from spartan_tpu.utils import miniz

    if not miniz.available():
        sys.exit("vendored miniz not available: fixtures must be "
                 "generated from the C library, not the madler fallback")
    os.makedirs(OUT, exist_ok=True)
    for name, data in payloads():
        stream = miniz.compress(data, 6)
        with open(os.path.join(OUT, name + ".deflate"), "wb") as f:
            f.write(stream)
        print(f"{name}: {len(data)} -> {len(stream)} B  "
              f"sha256={hashlib.sha256(stream).hexdigest()[:16]}")
    for name, stream in digest_payloads():
        with open(os.path.join(OUT, name + ".deflate"), "wb") as f:
            f.write(stream)
        print(f"{name}: {len(stream)} B  "
              f"sha256={hashlib.sha256(stream).hexdigest()[:16]}")


if __name__ == "__main__":
    main()
