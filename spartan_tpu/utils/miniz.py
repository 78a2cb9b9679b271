"""miniz (tdefl) zlib stream for the instance digest — byte parity.

The reference digests ``zlib(bincode(shape))`` through flate2's
``rust_backend`` — miniz_oxide, a port of miniz's tdefl compressor —
at ``Compression::default()`` (level 6) (reference Cargo.toml:31,75;
r1cs.rs:154-158).  CPython's ``zlib`` (madler) emits a *different*
(equally valid) deflate stream for the same input at the same level:
measured, the two streams differ for every nonempty input tried
(artifacts/miniz_ab_zlib.py).  The digest is absorbed into every
transcript (lib.rs:511-515), so a madler digest breaks
cross-verification for every instance.

This module binds the miniz 3.0.2 C library that the environment's
torch wheel vendors (``mz_compress2`` is exported from
libtorch_cpu.so) — the exact compressor family miniz_oxide ports.
``mz_compress2(level=6)`` performs one-shot compression with the same
flag mapping (``create_comp_flags_from_zip_params(6, 15, 0)``) the
Rust side derives, and tdefl's output is chunking-independent under
MZ_NO_FLUSH, so the one-shot stream equals flate2's streamed one.

When no vendored miniz can be found the caller falls back to madler
zlib (self-consistent proofs, documented divergence in PARITY.md);
``SPARTAN_TPU_MINIZ=0`` forces that fallback, ``SPARTAN_TPU_MINIZ_LIB``
points at an explicit shared object.
"""

from __future__ import annotations

import ctypes
import glob
import os
import sys
import zlib

_SEARCH_GLOBS = [
    # torch vendors miniz 3.0.2 (see torch-*.dist-info/licenses)
    os.path.join(p, "torch", "lib", "libtorch_cpu.so")
    for p in sys.path
    if p.endswith("site-packages")
] + [
    "/opt/venv/lib/python*/site-packages/torch/lib/libtorch_cpu.so",
]

_lib = None
_probed = False


def _load():
    global _lib, _probed
    if _probed:
        return _lib
    _probed = True
    if os.environ.get("SPARTAN_TPU_MINIZ", "1") == "0":
        return None
    cands = []
    explicit = os.environ.get("SPARTAN_TPU_MINIZ_LIB")
    if explicit:
        cands.append(explicit)
    for g in _SEARCH_GLOBS:
        cands.extend(sorted(glob.glob(g)) if any(c in g for c in "*?[") else
                     ([g] if os.path.exists(g) else []))
    for path in cands:
        try:
            lib = ctypes.CDLL(path)
            fn = lib.mz_compress2
        except (OSError, AttributeError):
            continue
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_ulong),
                       ctypes.c_char_p, ctypes.c_ulong, ctypes.c_int]
        _lib = fn
        break
    return _lib


def available() -> bool:
    return _load() is not None


def compress(data: bytes, level: int = 6) -> bytes:
    """miniz (tdefl) zlib stream; raises RuntimeError if unavailable."""
    fn = _load()
    if fn is None:
        raise RuntimeError("no vendored miniz found")
    n = len(data)
    # mz_compressBound: 110% + 128, but never below the stored-block
    # worst case (5 B of block header per 31 KB) — high-entropy bincode
    # (Montgomery scalars) can be incompressible (ADVICE r3 low)
    cap = max(128 + n * 110 // 100,
              128 + n + (n // (31 * 1024) + 1) * 5)
    dst = ctypes.create_string_buffer(cap)
    dlen = ctypes.c_ulong(cap)
    rc = fn(dst, ctypes.byref(dlen), data, n, int(level))
    if rc != 0:
        raise RuntimeError(f"mz_compress2 failed: {rc}")
    out = dst.raw[: dlen.value]
    assert zlib.decompress(out) == data  # cheap validity cross-check
    return out


_warned_fallback = False


def zlib_stream(data: bytes, level: int = 6) -> bytes:
    """The reference-parity stream: vendored miniz when available,
    madler zlib otherwise (documented divergence).  The fallback emits
    a one-time loud warning because it changes the instance digest —
    proofs made under madler will not cross-verify with miniz-digest
    proofs (ADVICE r3 medium)."""
    if available():
        return compress(data, level)
    global _warned_fallback
    if not _warned_fallback and os.environ.get("SPARTAN_TPU_MINIZ", "1") != "0":
        import warnings

        warnings.warn(
            "spartan_tpu: no vendored miniz found — falling back to "
            "madler zlib for the instance digest.  Digests (and hence "
            "transcripts) will differ from miniz-based environments; "
            "set SPARTAN_TPU_MINIZ=0 to silence or "
            "SPARTAN_TPU_MINIZ_LIB to point at a miniz shared object.",
            RuntimeWarning, stacklevel=2)
        _warned_fallback = True
    return zlib.compress(data, level)
