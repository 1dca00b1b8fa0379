"""Native C++ HNSW tests (build via make, load via ctypes)."""

import numpy as np
import pytest

from mediquery_rag_tpu.native import hnsw_available

pytestmark = pytest.mark.skipif(
    not hnsw_available(), reason="native toolchain unavailable")


def _clustered(n, d, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((32, d))
    asg = rng.integers(0, 32, n)
    x = centers[asg] + 0.3 * rng.standard_normal((n, d))
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


class TestHNSW:
    def test_recall_on_clustered(self):
        from mediquery_rag_tpu.native import HNSWIndex
        x = _clustered(5000, 64)
        rng = np.random.default_rng(1)
        q = x[rng.integers(0, 5000, 20)] + 0.05 * rng.standard_normal((20, 64)).astype(np.float32)
        q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
        ix = HNSWIndex(64, M=16, ef_construction=100)
        ix.add(x)
        assert ix.size == 5000
        _, i = ix.search(q, 10, ef=64)
        ref = np.argsort(-(q @ x.T), axis=1)[:, :10]
        rec = np.mean([len(set(i[r]) & set(ref[r])) / 10 for r in range(20)])
        assert rec >= 0.9, rec

    def test_exact_self_lookup(self):
        from mediquery_rag_tpu.native import HNSWIndex
        x = _clustered(1000, 32)
        ix = HNSWIndex(32, M=16, ef_construction=100)
        ix.add(x)
        _, i = ix.search(x[:10], 1, ef=32)
        assert (i[:, 0] == np.arange(10)).mean() >= 0.9

    def test_custom_labels_and_memory(self):
        from mediquery_rag_tpu.native import HNSWIndex
        x = _clustered(100, 32)
        ix = HNSWIndex(32)
        ix.add(x, labels=np.arange(1000, 1100))
        _, i = ix.search(x[0], 1)
        assert int(i[0, 0]) == 1000
        assert ix.nbytes > 100 * 32 * 4

    def test_empty_search(self):
        from mediquery_rag_tpu.native import HNSWIndex
        ix = HNSWIndex(16)
        s, i = ix.search(np.zeros(16, np.float32), 5)
        assert (s == -np.inf).all()
