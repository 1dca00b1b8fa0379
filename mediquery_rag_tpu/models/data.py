"""Training-pair pipeline for the embedder.

The reference consumed a pre-trained embedding model; a complete framework
must make its retriever trainable on its own corpus. The natural supervision
already in the QA corpus format: ``title`` (the question) is the query,
``content`` (the answer) is the positive document — in-batch negatives do
the rest (models/trainer.py). Includes light augmentation (random span
crops) so small corpora still give variation per epoch.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import jax
import numpy as np

from mediquery_rag_tpu.ingest.parser import Chunk
from mediquery_rag_tpu.models.tokenizer import HashCharTokenizer
from mediquery_rag_tpu.models.trainer import Batch


def pairs_from_chunks(chunks: Sequence[Chunk]) -> list[tuple[str, str]]:
    """(query, positive-doc) pairs: QA title -> content."""
    out = []
    for c in chunks:
        if c.title and c.content:
            out.append((c.title, c.content))
    return out


def _crop(text: str, rng: np.random.Generator, min_len: int = 16) -> str:
    if len(text) <= min_len:
        return text
    span = rng.integers(min_len, len(text) + 1)
    start = rng.integers(0, len(text) - span + 1)
    return text[start : start + span]


class PairLoader:
    """Shuffled, augmented, tokenized batches of contrastive pairs."""

    def __init__(self, pairs: list[tuple[str, str]],
                 tokenizer: HashCharTokenizer,
                 batch_size: int, seed: int = 0, augment: bool = True,
                 max_len: int = 128):
        if not pairs:
            raise ValueError("no training pairs")
        self.pairs = pairs
        self.tok = tokenizer
        self.bs = batch_size
        self.rng = np.random.default_rng(seed)
        self.augment = augment
        self.max_len = max_len

    def batches(self, epochs: int = 1) -> Iterator[Batch]:
        import jax.numpy as jnp
        for _ in range(epochs):
            order = self.rng.permutation(len(self.pairs))
            for i in range(0, len(order) - self.bs + 1, self.bs):
                idx = order[i : i + self.bs]
                qs, ds = [], []
                for j in idx:
                    q, d = self.pairs[j]
                    if self.augment:
                        d = _crop(d, self.rng)
                    qs.append(q)
                    ds.append(d)
                q_ids, q_mask = self.tok.batch_encode(qs, self.max_len)
                d_ids, d_mask = self.tok.batch_encode(ds, self.max_len)
                yield Batch(jnp.asarray(q_ids), jnp.asarray(q_mask),
                            jnp.asarray(d_ids), jnp.asarray(d_mask))
