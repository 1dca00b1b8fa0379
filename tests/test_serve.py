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


def test_selfrag_sessions_coalesce_through_batcher():
    """N concurrent Self-RAG sessions with the batcher as the graph's store:
    their retrieve nodes coalesce into shared TPU batches (the BASELINE
    north star — the loop issues batched queries straight into the engine)."""
    from mediquery_rag_tpu.graph import build_medical_graph, create_nodes
    from mediquery_rag_tpu.llm import RuleLLM, user

    store = build_document_store("data/medical_data.txt", HashingEmbedder(256), CFG)
    svc = BatchingSearchService(store.batch_search, max_batch=8, max_wait_ms=30)
    try:
        answers = {}

        def session(i):
            llm = RuleLLM([
                (r"yes 或 no", "yes"),
                (r"【用户问题】", f"回答{i}：参考资料已检索。"),
            ])
            app = build_medical_graph(create_nodes(llm, svc))
            events = list(app.stream(
                {"messages": [user(f"高血压 饮食 建议 {i}")],
                 "user_id": "anonymous"},
                thread_id=f"s{i}"))
            answers[i] = events[-1][1]["final_answer"]

        threads = [threading.Thread(target=session, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert len(answers) == 8
        for i, a in answers.items():
            assert f"回答{i}" in a
        assert svc.stats["max_batch_seen"] >= 2     # real coalescing happened
    finally:
        svc.shutdown()
