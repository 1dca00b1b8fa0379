"""ctypes wrapper over native/liblexical.so (C++ IDF n-gram embedder).

The lexical channel's host hot loop (models/lexical.py:IDFHashingEmbedder
._vec) is a per-character Python loop — the ingest bottleneck at
production corpus scale now that the IDF embedder is the shipping
default. The C++ path implements the 1/2-gram pipeline byte-for-byte
(native/lexical.cpp): same non-space filter, same FNV-1a/mix hashing,
same first-occurrence accumulation order and float widths, so vectors —
and therefore the embedder fingerprint and every persisted index — are
bit-identical (tests/test_native.py). Auto-builds with
``make -C native``; callers fall back to the Python loop when a compiler
is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_SO = os.path.join(_NATIVE_DIR, "liblexical.so")

_lib = None
_failed = False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    try:
        src = os.path.join(_NATIVE_DIR, "lexical.cpp")
        stale = (not os.path.exists(_SO)
                 or (os.path.exists(src)
                     and os.path.getmtime(src) > os.path.getmtime(_SO)))
        if stale:
            # mtime-aware rebuild: a stale .so would silently change the
            # vectors (and the embedder fingerprint) vs the source
            subprocess.run(["make", "-C", _NATIVE_DIR, "liblexical.so"],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.lex_vec_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.lex_vec_batch.restype = None
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def fnv1a64(data: bytes) -> int:
    """64-bit FNV-1a — the IDF-table key (collision-checked at fit)."""
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def lex_vec_batch(texts: list[str], keys: np.ndarray, weights: np.ndarray,
                  dim: int) -> np.ndarray:
    """Unit-norm [len(texts), dim] f32 rows. ``keys`` sorted u64 gram
    keys, ``weights`` aligned f64 IDF weights."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native lexical library unavailable")
    blobs = [t.encode("utf-8") for t in texts]
    offsets = np.zeros(len(blobs) + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    buf = np.frombuffer(b"".join(blobs) or b"\x00", np.uint8)
    out = np.zeros((len(texts), dim), np.float32)
    keys = np.ascontiguousarray(keys, np.uint64)
    weights = np.ascontiguousarray(weights, np.float64)
    lib.lex_vec_batch(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int32(len(texts)),
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(keys)), ctypes.c_int32(dim),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
