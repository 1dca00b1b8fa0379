"""On-device spherical k-means — the IVF coarse quantizer trainer.

Chroma's HNSW has no training phase; the TPU-native IVF index replaces graph
construction with k-means clustering done entirely on the MXU: assignment is
a [chunk, nlist] matmul + argmax, the centroid update is a one-hot matmul
(``onehot.T @ x``) — no scatters, no host round trips. Build cost per Lloyd
iteration is ~2*S*nlist*D FLOPs, i.e. milliseconds on a v5e chip for the
BASELINE config-3 scale (1M x 768, nlist=1024).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=("nlist", "iters", "chunk", "balance")
)
def kmeans(
    x: jax.Array,
    key: jax.Array,
    *,
    nlist: int,
    iters: int = 10,
    chunk: int = 8192,
    # chunk sizes the [chunk, nlist] one-hot HBM footprint of the centroid
    # update; 8192 x 1024 f32 = 32 MB keeps the Lloyd scan bandwidth-sane
    balance: float = 0.0,
) -> jax.Array:
    """Spherical k-means. ``x``: [S, D] L2-normalized f32. Returns [nlist, D].

    Centroids stay L2-normalized each iteration so assignment == cosine
    argmax. Empty clusters keep their previous centroid.

    ``balance > 0`` penalizes oversubscribed clusters during assignment
    (score - balance * (count/avg - 1), counts from the previous Lloyd
    pass): the bucket layout's cap is set by the LARGEST cluster, so a
    skewed clustering costs cap/avg in both HBM and probe DMA. Typical
    values 0.02-0.1 (cosine scores live in [-1, 1]).
    """
    s, d = x.shape
    chunk = min(chunk, s)
    n_chunks = -(-s // chunk)
    s_pad = n_chunks * chunk
    xp = jnp.pad(x, ((0, s_pad - s), (0, 0)))
    valid = (jnp.arange(s_pad) < s).astype(jnp.float32)
    xc = xp.reshape(n_chunks, chunk, d)
    vc = valid.reshape(n_chunks, chunk)
    avg = s / nlist

    perm = jax.random.permutation(key, s)[:nlist]
    cents0 = x[perm]

    def lloyd(carry, _):
        cents, prev_counts = carry
        penalty = balance * (prev_counts / avg - 1.0) if balance else None

        def per_chunk(acc, inp):
            sums, counts = acc
            xb, vb = inp
            scores = jnp.dot(xb, cents.T, preferred_element_type=jnp.float32)
            if penalty is not None:
                scores = scores - penalty[None, :]
            assign = jnp.argmax(scores, axis=-1)                    # [chunk]
            onehot = jax.nn.one_hot(assign, nlist, dtype=jnp.float32)
            onehot = onehot * vb[:, None]
            sums = sums + jnp.dot(onehot.T, xb, preferred_element_type=jnp.float32)
            counts = counts + onehot.sum(axis=0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            per_chunk,
            (jnp.zeros((nlist, d), jnp.float32), jnp.zeros((nlist,), jnp.float32)),
            (xc, vc),
        )
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), cents)
        norm = jnp.linalg.norm(new, axis=-1, keepdims=True)
        new = new / jnp.maximum(norm, 1e-12)
        return (new, counts), None

    (cents, _), _ = jax.lax.scan(
        lloyd, (cents0, jnp.full((nlist,), avg, jnp.float32)), None,
        length=iters)
    return cents


@functools.partial(jax.jit, static_argnames=("chunk",))
def assign_clusters(x: jax.Array, cents: jax.Array, *, chunk: int = 65536) -> jax.Array:
    """Nearest-centroid assignment for every row of ``x``. Returns [N] i32."""
    n, d = x.shape
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0))).reshape(n_chunks, chunk, d)

    def per_chunk(_, xb):
        scores = jnp.dot(xb, cents.T, preferred_element_type=jnp.float32)
        return None, jnp.argmax(scores, axis=-1).astype(jnp.int32)

    _, out = jax.lax.scan(per_chunk, None, xp)
    return out.reshape(n_pad)[:n]


@functools.partial(jax.jit, static_argnames=("r", "chunk"))
def assign_clusters_topr(
    x: jax.Array, cents: jax.Array, *, r: int, chunk: int = 65536
) -> tuple[jax.Array, jax.Array]:
    """Top-``r`` nearest centroids per row, with scores.

    Returns (cluster ids [N, r] i32 best-first, scores [N, r] f32). Feeds
    the bounded-cap bucket layout: overflow rows fall back to their
    next-best cluster instead of inflating the global cap.
    """
    n, d = x.shape
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    xp = jnp.pad(x, ((0, n_pad - n), (0, 0))).reshape(n_chunks, chunk, d)

    def per_chunk(_, xb):
        # bf16 inputs halve the MXU cost of the [chunk, nlist] assignment
        # matmul (63 TFLOP at 10M x 4096); accumulation stays f32 and
        # near-boundary flips only trade which probe finds a row
        scores = jnp.dot(xb.astype(jnp.bfloat16),
                         cents.T.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        s, i = jax.lax.top_k(scores, r)
        return None, (i.astype(jnp.int32), s)

    _, (ids, scores) = jax.lax.scan(per_chunk, None, xp)
    return ids.reshape(n_pad, r)[:n], scores.reshape(n_pad, r)[:n]
