"""Flat (exact brute-force) index — the engine's ground-truth path.

Replaces Chroma's persistent HNSW collection (reference:
medical_engine.py:52, ingest_medical.py:106-110). On TPU, exact search over
a resident ``[N, D]`` matrix at HBM bandwidth beats graph ANN up to tens of
millions of vectors — there is no pointer-chasing structure to build, so
"index build" is normalize + cast + pad: one pass at HBM speed
(BASELINE.json: "index build at HBM-bandwidth speed-of-light").
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from mediquery_rag_tpu.config import EngineConfig
from mediquery_rag_tpu.ops.scoring import flat_search
from mediquery_rag_tpu.ops.quant import int8_flat_search, quantize_rows


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x / jnp.maximum(n, eps)).astype(x.dtype)


@dataclass
class FlatIndex:
    """Exact search over an HBM-resident, tile-padded corpus matrix.

    ``cfg.dtype == "int8"`` stores a symmetric per-row quantized corpus
    (half the HBM traffic of bf16, BASELINE config 4); ``corpus_scale``
    is None for float dtypes.
    """

    corpus: jax.Array          # [N_pad, D], storage dtype, rows >= n pad-zeroed
    n: int                     # valid rows
    cfg: EngineConfig
    corpus_scale: jax.Array | None = None   # [N_pad] f32, int8 only

    @classmethod
    def build(cls, vectors, cfg: EngineConfig = EngineConfig()) -> "FlatIndex":
        """Build from ``[N, D]`` raw vectors: normalize (cosine), cast, pad."""
        v = jnp.asarray(vectors)
        n, d = v.shape
        if d != cfg.dim:
            cfg = EngineConfig(**{**cfg.__dict__, "dim": d})
        if cfg.metric == "cosine":
            v = l2_normalize(v.astype(jnp.float32))
        n_pad = _round_up(max(n, cfg.corpus_tile), cfg.corpus_tile)
        scale = None
        if cfg.dtype == "int8":
            v, scale = quantize_rows(v)
            if n_pad != n:
                scale = jnp.pad(scale, ((0, n_pad - n),))
        else:
            v = v.astype(jnp.dtype(cfg.dtype))
        if n_pad != n:
            v = jnp.pad(v, ((0, n_pad - n), (0, 0)))
        return cls(corpus=v, n=n, cfg=cfg, corpus_scale=scale)

    def search(self, queries, k: int | None = None):
        """Top-k search. Returns (scores [B,k] f32, indices [B,k] i32)."""
        k = self.cfg.top_k if k is None else k
        q = jnp.asarray(queries)
        squeeze = q.ndim == 1
        if squeeze:
            q = q[None, :]
        if self.cfg.metric == "cosine":
            q = l2_normalize(q.astype(jnp.float32))
        if self.corpus_scale is not None:
            s, i = int8_flat_search(
                q, self.corpus, self.corpus_scale, k,
                n_valid=self.n,
                query_tile=self.cfg.query_tile,
                corpus_tile=self.cfg.corpus_tile,
            )
        else:
            s, i = flat_search(
                q, self.corpus, k,
                n_valid=self.n,
                query_tile=self.cfg.query_tile,
                corpus_tile=self.cfg.corpus_tile,
            )
        if squeeze:
            return s[0], i[0]
        return s, i

    def _dequantized(self) -> jax.Array:
        """Valid rows as f32 (identity for float dtypes)."""
        rows = self.corpus[: self.n].astype(jnp.float32)
        if self.corpus_scale is not None:
            rows = rows * self.corpus_scale[: self.n, None]
        return rows

    def add(self, vectors) -> "FlatIndex":
        """Append vectors (returns a new index; arrays are immutable in JAX)."""
        v = jnp.asarray(vectors)
        if self.cfg.metric == "cosine":
            v = l2_normalize(v.astype(jnp.float32))
        if self.corpus_scale is not None:
            merged = jnp.concatenate([self._dequantized(), v.astype(jnp.float32)], 0)
            return FlatIndex.build(merged, self.cfg)
        v = v.astype(self.corpus.dtype)
        merged = jnp.concatenate([self.corpus[: self.n], v], axis=0)
        return self._replace_corpus_exact(merged, self.n + v.shape[0])

    def _replace_corpus_exact(self, merged, n):
        # build() re-normalizes; rows are already normalized, so re-pad only.
        n_pad = _round_up(max(n, self.cfg.corpus_tile), self.cfg.corpus_tile)
        if n_pad != n:
            merged = jnp.pad(merged, ((0, n_pad - n), (0, 0)))
        return FlatIndex(corpus=merged, n=n, cfg=self.cfg)

    # -- persistence (index checkpoint: SURVEY §5 "add a 4th mechanism") -----

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        arr = np.asarray(self._dequantized())
        np.save(os.path.join(path, "corpus.npy"), arr)
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"n": self.n, "kind": "flat", "cfg": self.cfg.__dict__}, f)

    @classmethod
    def load(cls, path: str) -> "FlatIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        cfg = EngineConfig(**{**EngineConfig().__dict__, **meta["cfg"]})
        arr = np.load(os.path.join(path, "corpus.npy"))
        return cls.build(arr, cfg)

    @property
    def nbytes(self) -> int:
        n = self.corpus.size * self.corpus.dtype.itemsize
        if self.corpus_scale is not None:
            n += self.corpus_scale.size * 4
        return n
