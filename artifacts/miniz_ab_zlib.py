"""A/B evidence for PARITY divergence #1 (VERDICT r2 next #9): does
madler zlib (CPython) emit the same deflate stream as miniz/tdefl (the
compressor family flate2's rust_backend = miniz_oxide ports, which the
reference uses for the instance digest, r1cs.rs:154-158)?

Answer (run this to reproduce): NO for every nonempty input tried —
including every bincode(shape) stream in the test matrix — so the
digest now routes through the vendored miniz (utils/miniz.py).
"""

import zlib

from spartan_tpu.utils import miniz


def main():
    assert miniz.available(), "vendored miniz not found"
    import random

    rng = random.Random(5)
    print(f"{'input':>28} {'miniz':>8} {'zlib':>8}  same?")
    rows = []
    for size in [0, 1, 10, 100, 1000, 5000, 50000, 200000]:
        data = bytes(rng.randrange(64) for _ in range(size))
        a, b = miniz.compress(data), zlib.compress(data, 6)
        rows.append((f"random[{size}]", a, b))

    # the real payloads: bincode(shape) for the test-matrix instances
    from spartan_tpu.api import Instance

    for n, ni in [(16, 2), (64, 4), (256, 10), (1024, 10)]:
        inst, _, _ = Instance.produce_synthetic_r1cs(n, n, ni, seed=424242)
        # recover the pre-compression stream: get_digest is
        # miniz(bincode); rebuild bincode by decompressing
        raw = zlib.decompress(inst.digest)
        a, b = miniz.compress(raw, 6), zlib.compress(raw, 6)
        rows.append((f"bincode(shape 2^{n.bit_length()-1})", a, b))

    n_same = 0
    for name, a, b in rows:
        same = a == b
        n_same += same
        print(f"{name:>28} {len(a):>8} {len(b):>8}  {same}")
    print(f"{n_same}/{len(rows)} identical (empty input only)")


if __name__ == "__main__":
    main()
