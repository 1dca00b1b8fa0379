"""Cross-shard top-k merge over ICI.

BASELINE.json: "multi-chip shards merge partial top-k via all-gather over
ICI". Each shard computes a local (scores, global-indices) top-k; the merge
all-gathers the tiny ``[B, k]`` candidate lists (bytes, not the corpus) and
reduces with one final top-k. Cheap at small k: 8 shards x k=10 x B=64 is
~20 KB on the wire.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mediquery_rag_tpu.ops.topk import merge_topk_many


def sharded_topk_merge(
    local_scores: jax.Array,
    local_idx: jax.Array,
    k: int,
    axis_name: str,
) -> tuple[jax.Array, jax.Array]:
    """Inside shard_map: merge per-shard partial top-k into the global top-k.

    Args:
      local_scores/local_idx: this shard's ``[B, kp]`` partials (global ids).
      k: final neighbors to keep.
      axis_name: mesh axis to gather over (rides ICI on a real slice).

    Returns replicated ``([B, k], [B, k])`` on every shard.
    """
    gs = jax.lax.all_gather(local_scores, axis_name)  # [S, B, kp]
    gi = jax.lax.all_gather(local_idx, axis_name)
    return merge_topk_many(gs, gi, k)
