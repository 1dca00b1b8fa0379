"""Serving layer: request micro-batching into the TPU engine."""

from mediquery_rag_tpu.serve.batcher import BatchingSearchService  # noqa: F401
