"""Ingest parser + DocumentStore tests (reference format parity)."""

import numpy as np
import pytest

from mediquery_rag_tpu.config import EngineConfig
from mediquery_rag_tpu.ingest import build_document_store, parse_corpus, parse_corpus_file
from mediquery_rag_tpu.ingest.pipeline import DocumentStore
from mediquery_rag_tpu.models import HashingEmbedder

CORPUS = "data/medical_data.txt"
CFG = EngineConfig(dim=256, dtype="float32", corpus_tile=256, query_tile=32)


class TestParser:
    def test_parse_sample_corpus(self):
        chunks = parse_corpus_file(CORPUS)
        assert len(chunks) == 12
        assert chunks[0].chunk_id == "001"
        assert "高血压" in chunks[0].title
        assert chunks[0].source.startswith("MediQuery")
        assert "血压" in chunks[0].tags

    def test_text_rendering(self):
        chunks = parse_corpus_file(CORPUS)
        assert chunks[0].text.startswith("问题：")
        assert "\n答案：" in chunks[0].text

    def test_tolerates_messy_fields(self):
        raw = (
            "chunk_id: 9\n"
            "title:\t\t多行内容测试\n"
            "content:  第一行\n  续行内容\n"
            "tags: a、b, c，d\n"
        )
        (c,) = parse_corpus(raw)
        assert c.content == "第一行\n续行内容"
        assert c.tags == ["a", "b", "c", "d"]

    def test_skips_empty_records(self):
        assert parse_corpus("chunk_id: 1\n\nchunk_id: 2\ntitle: t\ncontent: c\n") != []
        assert len(parse_corpus("chunk_id: 1\n\n")) == 0


class TestDocumentStore:
    @pytest.fixture(scope="class")
    def store(self):
        return build_document_store(CORPUS, HashingEmbedder(dim=256), CFG)

    def test_retrieves_relevant_chunk(self, store):
        docs = store.similarity_search("高血压患者吃饭要注意什么 饮食 限盐", k=3)
        assert len(docs) == 3
        assert any("高血压" in d.text for d in docs)

    def test_batch_search(self, store):
        res = store.batch_search(["睡眠不好怎么办", "糖尿病 运动"], k=2)
        assert len(res) == 2 and all(len(r) == 2 for r in res)
        assert any("睡眠" in d.text for d in res[0])
        assert any("运动" in d.text or "糖尿病" in d.text for d in res[1])

    def test_k_clamped_to_corpus(self, store):
        docs = store.similarity_search("血压", k=100)
        assert len(docs) <= 12

    def test_save_load_roundtrip(self, store, tmp_path):
        store.save(str(tmp_path / "store"))
        loaded = DocumentStore.load(str(tmp_path / "store"), HashingEmbedder(dim=256))
        assert len(loaded.chunks) == 12
        d1 = store.similarity_search("骨质疏松 预防", k=2)
        d2 = loaded.similarity_search("骨质疏松 预防", k=2)
        assert [x.metadata["chunk_id"] for x in d1] == [
            x.metadata["chunk_id"] for x in d2
        ]


class TestEmbedderFingerprint:
    def test_mismatched_embedder_rejected(self, tmp_path):
        store = build_document_store(CORPUS, HashingEmbedder(dim=256), CFG)
        store.save(str(tmp_path / "s"))

        class OtherEmbedder:
            def __call__(self, texts):
                import numpy as np
                base = HashingEmbedder(dim=256)(texts)
                return -base          # same dim, different space

        with pytest.raises(ValueError, match="different embedder"):
            DocumentStore.load(str(tmp_path / "s"), OtherEmbedder())

    def test_matching_embedder_loads(self, tmp_path):
        store = build_document_store(CORPUS, HashingEmbedder(dim=256), CFG)
        store.save(str(tmp_path / "s"))
        loaded = DocumentStore.load(str(tmp_path / "s"), HashingEmbedder(dim=256))
        assert len(loaded.chunks) == 12
