"""Micro-batching serving layer tests."""

import threading
import time

import pytest

from mediquery_rag_tpu.config import EngineConfig
from mediquery_rag_tpu.ingest import build_document_store
from mediquery_rag_tpu.models import HashingEmbedder
from mediquery_rag_tpu.serve import BatchingSearchService

CFG = EngineConfig(dim=256, dtype="float32", corpus_tile=256, query_tile=32)


@pytest.fixture()
def service():
    store = build_document_store("data/medical_data.txt", HashingEmbedder(256), CFG)
    svc = BatchingSearchService(store.batch_search, max_batch=8, max_wait_ms=20)
    yield svc
    svc.shutdown()


def test_single_request(service):
    docs = service.search("高血压 饮食 限盐", k=3)
    assert len(docs) == 3
    assert any("高血压" in d.text for d in docs)


def test_concurrent_requests_coalesce(service):
    results = {}

    def worker(i, q):
        results[i] = service.search(q, k=2)

    threads = [threading.Thread(target=worker, args=(i, q)) for i, q in
               enumerate(["睡眠不好", "糖尿病 运动", "血脂 高", "骨质疏松",
                          "高血压 饮食", "心肺功能", "力量训练", "情绪压力"])]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert len(results) == 8
    assert all(len(v) == 2 for v in results.values())
    # at least one multi-request batch formed
    assert service.stats["max_batch_seen"] >= 2
    assert service.stats["batches"] < service.stats["requests"]


def test_mixed_k_in_one_batch(service):
    f1 = service.submit("睡眠", k=1)
    f2 = service.submit("血压", k=4)
    assert len(f1.result(10)) == 1
    assert len(f2.result(10)) == 4


def test_engine_error_propagates():
    def broken(queries, k):
        raise RuntimeError("engine down")

    svc = BatchingSearchService(broken, max_wait_ms=1)
    try:
        with pytest.raises(RuntimeError, match="engine down"):
            svc.search("q", k=1, timeout=5)
    finally:
        svc.shutdown()


def test_shutdown_idempotent(service):
    service.shutdown()
    service.shutdown()
