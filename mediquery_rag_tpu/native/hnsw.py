"""ctypes wrapper over native/libhnsw.so (in-repo C++ HNSW).

Auto-builds the shared library with `make -C native` on first use. This is
the CPU-side ANN engine used by the recall-parity harness
(benchmarks/parity.py) — the stand-in for Chroma's hnswlib that the BASELINE
"recall parity at equal memory" comparison is measured against.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_SO = os.path.join(_NATIVE_DIR, "libhnsw.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.hnsw_create.restype = ctypes.c_void_p
    lib.hnsw_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.hnsw_add_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int]
    lib.hnsw_search.restype = ctypes.c_int
    lib.hnsw_search.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_float)]
    lib.hnsw_search_batch.restype = ctypes.c_int
    lib.hnsw_search_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int]
    lib.hnsw_memory_bytes.restype = ctypes.c_uint64
    lib.hnsw_memory_bytes.argtypes = [ctypes.c_void_p]
    lib.hnsw_size.restype = ctypes.c_uint64
    lib.hnsw_size.argtypes = [ctypes.c_void_p]
    lib.hnsw_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def hnsw_available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


class HNSWIndex:
    """Cosine-metric HNSW over L2-normalized float32 vectors."""

    def __init__(self, dim: int, M: int = 16, ef_construction: int = 200):
        self._lib = _load()
        self._h = self._lib.hnsw_create(dim, M, ef_construction)
        self.dim = dim

    def add(self, vectors: np.ndarray, labels: np.ndarray | None = None) -> None:
        v = np.ascontiguousarray(vectors, dtype=np.float32)
        n = v.shape[0]
        if labels is None:
            labels = np.arange(self.size, self.size + n, dtype=np.uint64)
        lab = np.ascontiguousarray(labels, dtype=np.uint64)
        self._lib.hnsw_add_batch(
            self._h,
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            n,
        )

    def search(self, queries: np.ndarray, k: int, ef: int = 64,
               threads: int = 1):
        """Batch top-k. ``threads`` > 1 (or 0 = all cores) runs the batch
        through the OpenMP path — per-thread visited tables over the
        read-only graph, the same query-parallel scheme hnswlib uses."""
        q = np.ascontiguousarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None]
        b = q.shape[0]
        labels = np.zeros((b, k), dtype=np.uint64)
        scores = np.full((b, k), -np.inf, dtype=np.float32)
        counts = np.zeros(b, dtype=np.int32)
        self._lib.hnsw_search_batch(
            self._h,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b, k, ef,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            threads,
        )
        return scores, labels.astype(np.int64)

    @property
    def size(self) -> int:
        return int(self._lib.hnsw_size(self._h))

    @property
    def nbytes(self) -> int:
        return int(self._lib.hnsw_memory_bytes(self._h))

    def __del__(self):
        try:
            self._lib.hnsw_free(self._h)
        except Exception:
            pass
