"""Loader for the native host-crypto library (host_crypto.cpp).

Builds on first import with g++ (-O3 -shared -fPIC) into a cache
directory keyed by a source hash, so edits recompile automatically and
repeated imports are instant.  If no compiler is available, everything
falls back to the pure-Python implementations in spartan_tpu.core —
set SPARTAN_TPU_NATIVE=0 to force the fallback.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_crypto.cpp")

_lib = None
_tried = False


def _build_and_load() -> ctypes.CDLL | None:
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = os.environ.get(
        "SPARTAN_TPU_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "spartan_tpu_native"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"host_crypto_{tag}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
               "-fPIC", _SRC, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired):
            return None
        os.replace(tmp, so_path)
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    size_t = ctypes.c_size_t

    lib.spartan_keccak_f1600.argtypes = [ctypes.c_char_p]
    lib.spartan_strobe_init.argtypes = [ctypes.c_char_p, ctypes.c_char_p, size_t]
    for name in ("spartan_strobe_meta_ad", "spartan_strobe_ad",
                 "spartan_strobe_key"):
        getattr(lib, name).argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, size_t, ctypes.c_int]
    lib.spartan_strobe_prf.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, size_t, ctypes.c_int]

    lib.spartan_ge_add.argtypes = [ctypes.c_char_p] * 2 + [ctypes.c_char_p]
    lib.spartan_ge_double.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.spartan_ge_neg.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.spartan_ge_scalarmul.argtypes = [ctypes.c_char_p] * 2 + [ctypes.c_char_p]
    lib.spartan_ge_msm.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, size_t, ctypes.c_char_p]
    lib.spartan_ristretto_decode.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.spartan_ristretto_decode.restype = ctypes.c_int
    lib.spartan_ristretto_encode.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.spartan_ristretto_encode_batch.argtypes = [
        ctypes.c_char_p, size_t, ctypes.c_char_p]
    lib.spartan_ristretto_from_uniform.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p]
    del u8p
    return lib


def get_lib() -> ctypes.CDLL | None:
    """The loaded native library, or None (pure-Python fallback)."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SPARTAN_TPU_NATIVE", "1") == "0":
        return None
    _lib = _build_and_load()
    return _lib


def available() -> bool:
    return get_lib() is not None
