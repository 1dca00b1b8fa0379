"""Top-k selection and merge primitives.

The reference's nearest-neighbor selection lives inside hnswlib's C++ priority
queues (via ChromaDB, reference medical_engine.py:52). Here selection is an
on-device primitive: ``exact_topk`` is the XLA oracle, ``merge_topk`` combines
partial top-k lists (used for cross-shard ICI merges and IVF probe merges).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exact_topk(scores: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """XLA top-k over the last axis. Returns (values, indices), sorted desc.

    This is the correctness oracle for the Pallas fused kernel and the
    baseline path for `bench.py`'s vs_baseline ratio.
    """
    return jax.lax.top_k(scores, k)


def merge_topk(
    scores_a: jax.Array,
    idx_a: jax.Array,
    scores_b: jax.Array,
    idx_b: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Merge two partial top-k lists along the last axis.

    Shapes: scores_* [..., ka], [..., kb] -> ([..., k], [..., k]).
    Used to fold per-shard partial results after an all-gather over ICI
    (the comm pattern BASELINE.json names: "multi-chip shards merge partial
    top-k via all-gather over ICI").
    """
    s = jnp.concatenate([scores_a, scores_b], axis=-1)
    i = jnp.concatenate([idx_a, idx_b], axis=-1)
    vals, pos = jax.lax.top_k(s, k)
    return vals, jnp.take_along_axis(i, pos, axis=-1)


def merge_topk_many(
    scores: jax.Array, idx: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Merge ``[n_parts, ..., kp]`` partial lists into one ``[..., k]`` list.

    ``scores``/``idx`` carry a leading parts axis (e.g. the all-gather axis).
    """
    n = scores.shape[0]
    s = jnp.moveaxis(scores, 0, -2).reshape(*scores.shape[1:-1], n * scores.shape[-1])
    i = jnp.moveaxis(idx, 0, -2).reshape(*idx.shape[1:-1], n * idx.shape[-1])
    vals, pos = jax.lax.top_k(s, k)
    return vals, jnp.take_along_axis(i, pos, axis=-1)
