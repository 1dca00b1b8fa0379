"""Serving layer: request micro-batching into the TPU engine."""

from mediquery_rag_tpu.serve.batcher import BatchingSearchService  # noqa: F401
from mediquery_rag_tpu.serve.server import SearchServer  # noqa: F401
