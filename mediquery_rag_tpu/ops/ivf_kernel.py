"""Pallas IVF probe-and-score kernel: data-dependent bucket DMA.

The TPU replacement for hnswlib's graph traversal (reference:
medical_engine.py:52 via Chroma). Probed cluster ids — computed by a tiny
centroid matmul + top-k — are passed as *scalar-prefetch* arguments, so each
grid step's BlockSpec index_map selects which bucket to DMA from HBM into
VMEM before the kernel body runs. The kernel only ever touches
``B x nprobe x cap`` corpus rows instead of all N: that is where the >=10x
QPS over brute force comes from at small batch (BASELINE configs 3/5).

Grid = (B, nprobe), nprobe minor: for one query the probed buckets stream
sequentially while its running top-k stays resident in VMEM (same
accumulator pattern as ops/scoring.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mediquery_rag_tpu.ops.scoring import (
    LANE, NEG_INF, _merge_tile_sorted, _on_tpu,
)


def _ivf_kernel(pids_ref, q_ref, buckets_ref, bids_ref, out_s_ref, out_i_ref,
                sc_ref, flag_ref, *, k):
    # Per-query arrays carry a singleton sublane axis ([B, 1, D] etc.) because
    # TPU block shapes must tile the array dims; refs here are (1, 1, X).
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.zeros_like(out_i_ref)

    q = q_ref[:].reshape(1, q_ref.shape[-1])            # [1, D]
    # [1, D] x [cap, D]^T -> [1, cap]
    scores = jax.lax.dot_general(
        q, buckets_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ids = bids_ref[:].reshape(1, bids_ref.shape[-1])    # [1, cap], -1 = pad
    scores = jnp.where(ids >= 0, scores, NEG_INF)

    # flag-gated sorted insert (same accumulator as the flat kernel):
    # unconditional cost per probed bucket is one row-max, not k extractions
    _merge_tile_sorted(scores, ids, k, out_s_ref.at[0], out_i_ref.at[0],
                       sc_ref, flag_ref)


@functools.partial(jax.jit, static_argnames=("k", "cap", "interpret"))
def _ivf_probe_search(
    probe_ids: jax.Array,   # [B, nprobe] i32 cluster ids
    queries: jax.Array,     # [B, D] storage dtype
    buckets: jax.Array,     # [nlist * cap, D] storage dtype
    bucket_ids: jax.Array,  # [nlist, cap] i32 global doc ids, -1 = empty
    *,
    k: int,
    cap: int,
    interpret: bool,
):
    b, d = queries.shape
    nlist = bucket_ids.shape[0]
    nprobe = probe_ids.shape[1]
    kp = LANE

    q3 = queries.reshape(b, 1, d)
    bids3 = bucket_ids.reshape(nlist, 1, cap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nprobe),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda i, j, pids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, d), lambda i, j, pids: (pids[i, j], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cap), lambda i, j, pids: (pids[i, j], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, kp), lambda i, j, pids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kp), lambda i, j, pids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, cap), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out_s, out_i = pl.pallas_call(
        functools.partial(_ivf_kernel, k=k),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, kp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, kp), jnp.int32),
        ],
        interpret=interpret,
    )(probe_ids, q3, buckets, bids3)
    return out_s[:, 0, :k], out_i[:, 0, :k]


def ivf_probe_search(
    probe_ids, queries, buckets, bucket_ids, *, k, interpret=None
):
    """Score each query against its probed buckets, fused top-k.

    Returns (scores [B,k] f32, global doc indices [B,k] i32; -inf/0 rows
    where fewer than k real docs were probed).
    """
    if interpret is None:
        interpret = not _on_tpu()
    cap = bucket_ids.shape[1]
    return _ivf_probe_search(
        probe_ids, queries, buckets, bucket_ids,
        k=k, cap=cap, interpret=interpret,
    )


def _ivf_int8_kernel(pids_ref, q_ref, buckets_ref, bids_ref, bsc_ref,
                     out_s_ref, out_i_ref, sc_ref, flag_ref, *, k):
    """int8 variant: buckets int8 + per-row scales. The query is int8 too;
    its per-query scale is a positive constant per row so it cannot change
    the ranking — the caller rescales the returned top-k scores."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.zeros_like(out_i_ref)

    q = q_ref[:].reshape(1, q_ref.shape[-1])                   # [1, D] i8
    raw = jax.lax.dot_general(
        q, buckets_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                          # [1, cap] i32
    scales = bsc_ref[:].reshape(1, bsc_ref.shape[-1])          # [1, cap]
    scores = raw.astype(jnp.float32) * scales
    ids = bids_ref[:].reshape(1, bids_ref.shape[-1])
    scores = jnp.where(ids >= 0, scores, NEG_INF)

    _merge_tile_sorted(scores, ids, k, out_s_ref.at[0], out_i_ref.at[0],
                       sc_ref, flag_ref)


@functools.partial(jax.jit, static_argnames=("k", "cap", "interpret"))
def _ivf_probe_search_int8(probe_ids, q8, buckets, bucket_ids, bucket_scales,
                           *, k, cap, interpret):
    b, d = q8.shape
    nlist = bucket_ids.shape[0]
    nprobe = probe_ids.shape[1]
    kp = LANE

    q3 = q8.reshape(b, 1, d)
    bids3 = bucket_ids.reshape(nlist, 1, cap)
    bsc3 = bucket_scales.reshape(nlist, 1, cap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nprobe),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda i, j, pids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, d), lambda i, j, pids: (pids[i, j], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cap), lambda i, j, pids: (pids[i, j], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cap), lambda i, j, pids: (pids[i, j], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, kp), lambda i, j, pids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kp), lambda i, j, pids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, cap), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out_s, out_i = pl.pallas_call(
        functools.partial(_ivf_int8_kernel, k=k),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, kp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, kp), jnp.int32),
        ],
        interpret=interpret,
    )(probe_ids, q3, buckets, bids3, bsc3)
    return out_s[:, 0, :k], out_i[:, 0, :k]


def ivf_probe_search_int8(probe_ids, queries, buckets, bucket_ids,
                          bucket_scales, *, k, interpret=None):
    """int8 probe search. ``queries`` f32 [B, D] (quantized here);
    returned scores are rescaled by the per-query scale."""
    from mediquery_rag_tpu.ops.quant import quantize_rows

    if interpret is None:
        interpret = not _on_tpu()
    q8, qs = quantize_rows(queries)
    cap = bucket_ids.shape[1]
    s, i = _ivf_probe_search_int8(
        probe_ids, q8, buckets, bucket_ids, bucket_scales,
        k=k, cap=cap, interpret=interpret)
    return s * qs[:, None], i


def _ivf_int4_kernel(pids_ref, q_ref, buckets_ref, bids_ref, bsc_ref,
                     out_s_ref, out_i_ref, sc_ref, flag_ref, *, k):
    """int4 variant: buckets are bucket-local split-half packed (slot j in
    the low nibble of packed row j, slot j+cap/2 in the high nibble — see
    ops/quant.py ivf_pack_slots_int4), so half the probe DMA bytes of int8.
    Scoring is the row-pair identity from the flat int4 kernel: two i8 MXU
    dots + one ``& 15`` VPU pass per probed bucket. The per-query scale is
    rank-preserving and applied by the caller."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.zeros_like(out_i_ref)

    p = buckets_ref[:]                                      # [cap/2, D] i8
    caph = p.shape[0]
    ulo = p & 15
    q = q_ref[:].reshape(1, q_ref.shape[-1])                # [1, D] i8
    dims = (((1,), (1,)), ((), ()))
    dotU = jax.lax.dot_general(q, ulo, dimension_numbers=dims,
                               preferred_element_type=jnp.int32)
    dotP = jax.lax.dot_general(q, p, dimension_numbers=dims,
                               preferred_element_type=jnp.int32)
    corr = 8.0 * jnp.sum(q.astype(jnp.int32)).astype(jnp.float32)
    dU = dotU.astype(jnp.float32)
    # scales arrive pre-shaped [1, 2, caph]: slicing the SUBLANE axis is
    # always aligned — a lane slice at offset caph (not a multiple of 128)
    # fails Mosaic lowering on real TPU (interpret mode never catches it)
    scales = bsc_ref[:].reshape(2, caph)
    even = (dU - corr) * scales[0:1, :]
    odd = (dotP.astype(jnp.float32) - dU) * scales[1:2, :] * 0.0625
    scores = jnp.concatenate([even, odd], axis=1)           # slot order
    ids = bids_ref[:].reshape(1, bids_ref.shape[-1])
    scores = jnp.where(ids >= 0, scores, NEG_INF)

    _merge_tile_sorted(scores, ids, k, out_s_ref.at[0], out_i_ref.at[0],
                       sc_ref, flag_ref)


@functools.partial(jax.jit, static_argnames=("k", "cap", "interpret"))
def _ivf_probe_search_int4(probe_ids, q8, buckets, bucket_ids, bucket_scales,
                           *, k, cap, interpret):
    b, d = q8.shape
    nlist = bucket_ids.shape[0]
    nprobe = probe_ids.shape[1]
    kp = LANE
    caph = cap // 2

    q3 = q8.reshape(b, 1, d)
    bids3 = bucket_ids.reshape(nlist, 1, cap)
    bsc3 = bucket_scales.reshape(nlist, 2, caph)   # (even, odd) plane rows

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nprobe),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda i, j, pids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((caph, d), lambda i, j, pids: (pids[i, j], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cap), lambda i, j, pids: (pids[i, j], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, caph), lambda i, j, pids: (pids[i, j], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, kp), lambda i, j, pids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kp), lambda i, j, pids: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, cap), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out_s, out_i = pl.pallas_call(
        functools.partial(_ivf_int4_kernel, k=k),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, kp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, kp), jnp.int32),
        ],
        interpret=interpret,
    )(probe_ids, q3, buckets, bids3, bsc3)
    return out_s[:, 0, :k], out_i[:, 0, :k]


def ivf_probe_search_int4(probe_ids, queries, buckets, bucket_ids,
                          bucket_scales, *, k, interpret=None):
    """int4 probe search over split-half packed buckets. ``queries`` f32
    [B, D] (int8-quantized here); returned scores are rescaled."""
    from mediquery_rag_tpu.ops.quant import quantize_rows

    if interpret is None:
        interpret = not _on_tpu()
    q8, qs = quantize_rows(queries)
    cap = bucket_ids.shape[1]
    s, i = _ivf_probe_search_int4(
        probe_ids, q8, buckets, bucket_ids, bucket_scales,
        k=k, cap=cap, interpret=interpret)
    return s * qs[:, None], i


# -- bucket-major batched probe search ---------------------------------------
#
# The per-query kernel above runs grid (B, nprobe): each step is a
# [1, D] x [D, cap] matmul and buckets probed by several queries are DMA'd
# once *per query*. The bucket-major layout inverts the loop: deduplicate the
# probed cluster ids, then for each unique bucket score the ENTIRE query
# batch ([B, D] x [D, cap], a real MXU matmul) and fold rows into per-query
# running top-k accumulators that stay resident in VMEM for the whole grid.
# HBM bucket traffic drops from B*nprobe to n_unique blocks.
#
# Measured trade-off (benchmarks/ivf_batch.py, v5e): the per-step top-k merge
# runs over the whole [B, cap] score tile, so bucket-major only wins once the
# DMA dedup factor covers that cost — crossover at draws B*nprobe ~ 2*nlist,
# then 2-4x faster by draws ~ 4*nlist (high-nprobe / high-recall regimes,
# large batches, or skewed probe distributions). ``IVFIndex.search`` picks
# the layout automatically.


def _ivf_batch_kernel(uniq_ref, probe_ref, q_ref, buckets_ref, bids_ref,
                      out_s_ref, out_i_ref, sc_ref, flag_ref, *, k):
    u = pl.program_id(0)
    uid = uniq_ref[u]

    @pl.when(u == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.zeros_like(out_i_ref)

    @pl.when(uid >= 0)
    def _body():
        # [B, D] x [cap, D]^T -> [B, cap] on the MXU
        scores = jax.lax.dot_general(
            q_ref[:], buckets_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ids = bids_ref[:].reshape(1, bids_ref.shape[-1])     # [1, cap]
        # rows whose probe list contains this bucket participate; others -inf
        probed = jnp.any(probe_ref[:] == uid, axis=1, keepdims=True)  # [B, 1]
        scores = jnp.where(ids >= 0, scores, NEG_INF)
        scores = jnp.where(probed, scores, NEG_INF)
        col = jnp.broadcast_to(ids, scores.shape)
        _merge_tile_sorted(scores, col, k, out_s_ref, out_i_ref,
                           sc_ref, flag_ref)


def _ivf_batch_int8_kernel(uniq_ref, probe_ref, q_ref, buckets_ref, bids_ref,
                           bsc_ref, out_s_ref, out_i_ref, sc_ref, flag_ref,
                           *, k):
    """int8 bucket-major variant: i8 x i8 -> i32 MXU, per-doc-row rescale.
    Per-query scales are positive constants per row (rank-preserving); the
    caller rescales the returned top-k scores."""
    u = pl.program_id(0)
    uid = uniq_ref[u]

    @pl.when(u == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.zeros_like(out_i_ref)

    @pl.when(uid >= 0)
    def _body():
        raw = jax.lax.dot_general(
            q_ref[:], buckets_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                                    # [B, cap] i32
        scales = bsc_ref[:].reshape(1, bsc_ref.shape[-1])    # [1, cap]
        scores = raw.astype(jnp.float32) * scales
        ids = bids_ref[:].reshape(1, bids_ref.shape[-1])
        probed = jnp.any(probe_ref[:] == uid, axis=1, keepdims=True)
        scores = jnp.where(ids >= 0, scores, NEG_INF)
        scores = jnp.where(probed, scores, NEG_INF)
        col = jnp.broadcast_to(ids, scores.shape)
        _merge_tile_sorted(scores, col, k, out_s_ref, out_i_ref,
                           sc_ref, flag_ref)


def _ivf_batch_int4_kernel(uniq_ref, probe_ref, q_ref, buckets_ref, bids_ref,
                           bsc_ref, out_s_ref, out_i_ref, sc_ref, flag_ref,
                           *, k):
    """int4 bucket-major variant: split-half packed bucket, whole-batch
    row-pair scoring (two i8 MXU dots per unique bucket)."""
    u = pl.program_id(0)
    uid = uniq_ref[u]

    @pl.when(u == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.zeros_like(out_i_ref)

    @pl.when(uid >= 0)
    def _body():
        p = buckets_ref[:]                                  # [cap/2, D] i8
        caph = p.shape[0]
        ulo = p & 15
        q = q_ref[:]                                        # [B, D] i8
        dims = (((1,), (1,)), ((), ()))
        dotU = jax.lax.dot_general(q, ulo, dimension_numbers=dims,
                                   preferred_element_type=jnp.int32)
        dotP = jax.lax.dot_general(q, p, dimension_numbers=dims,
                                   preferred_element_type=jnp.int32)
        corr = 8.0 * jnp.sum(q.astype(jnp.int32), axis=1,
                             keepdims=True).astype(jnp.float32)
        dU = dotU.astype(jnp.float32)
        # sublane-axis plane slices (lane slices at offset caph misalign)
        scales = bsc_ref[:].reshape(2, caph)
        even = (dU - corr) * scales[0:1, :]
        odd = (dotP.astype(jnp.float32) - dU) * scales[1:2, :] * 0.0625
        scores = jnp.concatenate([even, odd], axis=1)       # [B, cap] slots
        ids = bids_ref[:].reshape(1, bids_ref.shape[-1])
        probed = jnp.any(probe_ref[:] == uid, axis=1, keepdims=True)
        scores = jnp.where(ids >= 0, scores, NEG_INF)
        scores = jnp.where(probed, scores, NEG_INF)
        col = jnp.broadcast_to(ids, scores.shape)
        _merge_tile_sorted(scores, col, k, out_s_ref, out_i_ref,
                           sc_ref, flag_ref)


@functools.partial(
    jax.jit, static_argnames=("k", "cap", "n_uniq", "interpret", "quant")
)
def _ivf_batch_search(
    probe_pad: jax.Array,     # [Bp, nprobe] i32, -1 on padded query rows
    uniq: jax.Array,          # [n_uniq] i32 unique bucket ids, -1 = pad (tail)
    q_pad: jax.Array,         # [Bp, D] storage dtype (i8 for int8 path)
    buckets: jax.Array,       # [nlist * cap, D]
    bucket_ids: jax.Array,    # [nlist, cap] i32, -1 = empty slot
    bucket_scales: jax.Array, # [nlist, cap] f32 (int8 path; dummy otherwise)
    *,
    k: int,
    cap: int,
    n_uniq: int,
    interpret: bool,
    quant: str,          # "none" | "int8" | "int4"
):
    bp, d = q_pad.shape
    nlist = bucket_ids.shape[0]
    nprobe = probe_pad.shape[1]
    kp = LANE

    # singleton sublane axis so per-bucket row blocks satisfy the TPU block
    # tiling rule (same layout trick as the query-major kernel above);
    # int4 scales reshape to (even, odd) plane rows for aligned slicing
    bids3 = bucket_ids.reshape(nlist, 1, cap)
    if quant == "int4":
        bsc3 = bucket_scales.reshape(nlist, 2, cap // 2)
    elif quant == "int8":
        bsc3 = bucket_scales.reshape(nlist, 1, cap)
    else:
        bsc3 = bucket_scales

    # padded uniq entries sit contiguously at the tail; clamping their
    # index_map to bucket 0 means at most one redundant DMA for the whole tail
    def bucket_map(u, uq):
        return (jnp.maximum(uq[u], 0), 0)

    def bucket_map3(u, uq):
        return (jnp.maximum(uq[u], 0), 0, 0)

    rows = cap // 2 if quant == "int4" else cap   # packed byte-rows per bucket
    in_specs = [
        pl.BlockSpec((bp, nprobe), lambda u, uq: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bp, d), lambda u, uq: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, d), bucket_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cap), bucket_map3, memory_space=pltpu.VMEM),
    ]
    operands = [probe_pad, q_pad, buckets, bids3]
    if quant != "none":
        sc_block = (1, 2, cap // 2) if quant == "int4" else (1, 1, cap)
        in_specs.append(pl.BlockSpec(sc_block, bucket_map3,
                                     memory_space=pltpu.VMEM))
        operands.append(bsc3)
        kern = functools.partial(
            _ivf_batch_int4_kernel if quant == "int4"
            else _ivf_batch_int8_kernel, k=k)
    else:
        kern = functools.partial(_ivf_batch_kernel, k=k)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_uniq,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bp, kp), lambda u, uq: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, kp), lambda u, uq: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((bp, cap), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out_s, out_i = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bp, kp), jnp.float32),
            jax.ShapeDtypeStruct((bp, kp), jnp.int32),
        ],
        interpret=interpret,
    )(uniq, *operands)
    return out_s, out_i


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def ivf_batch_search(probe_ids, queries, buckets, bucket_ids, *,
                     k, bucket_scales=None, quant=None, interpret=None):
    """Bucket-major batched probe search (see module notes above).

    Args:
      probe_ids: [B, nprobe] i32 probed cluster ids per query.
      queries: [B, D] f32/bf16 (quantized here when ``bucket_scales`` given).
      buckets / bucket_ids / bucket_scales: IVF storage as in
        :func:`ivf_probe_search` / :func:`ivf_probe_search_int8`.
      quant: "none" | "int8" | "int4"; default int8 when scales are given
        (int4 buckets are split-half packed — ivf_pack_slots_int4).

    Returns (scores [B, k] f32, global doc indices [B, k] i32).
    """
    if interpret is None:
        interpret = not _on_tpu()
    if quant is None:
        quant = "int8" if bucket_scales is not None else "none"
    b, nprobe = probe_ids.shape
    cap = bucket_ids.shape[1]
    nlist = bucket_ids.shape[0]
    if quant == "int8" and buckets.shape[0] < nlist * cap:
        # split-half packed int4 buckets have nlist*cap/2 rows; scoring the
        # packed bytes as int8 codes is silently wrong — demand quant="int4"
        raise ValueError(
            f"buckets has {buckets.shape[0]} rows but int8 needs "
            f"nlist*cap={nlist * cap}; packed int4 input? pass quant='int4'")

    if quant != "none":
        from mediquery_rag_tpu.ops.quant import quantize_rows
        q, qs = quantize_rows(queries)
    else:
        q = queries.astype(buckets.dtype)
        qs = None

    bp = _round_up(max(b, 16), 16)
    if bp != b:
        q = jnp.pad(q, ((0, bp - b), (0, 0)))
        probe_ids = jnp.pad(probe_ids, ((0, bp - b), (0, 0)),
                            constant_values=-1)

    n_uniq = min(b * nprobe, nlist)
    uniq = jnp.unique(probe_ids[:b].reshape(-1), size=n_uniq, fill_value=-1)

    scales = (bucket_scales if quant != "none"
              else jnp.zeros((nlist, cap), jnp.float32))
    s, i = _ivf_batch_search(
        probe_ids.astype(jnp.int32), uniq.astype(jnp.int32), q,
        buckets, bucket_ids, scales,
        k=k, cap=cap, n_uniq=n_uniq, interpret=interpret, quant=quant,
    )
    s, i = s[:b, :k], i[:b, :k]
    if quant != "none":
        s = s * qs[:, None]
    return s, i


@functools.partial(jax.jit, static_argnames=("k",))
def ivf_probe_search_xla(probe_ids, queries, buckets, bucket_ids, *, k):
    """Gather-based XLA oracle (memory-heavy; for tests/small shapes only)."""
    nlist, cap = bucket_ids.shape
    d = queries.shape[1]
    bk = buckets.reshape(nlist, cap, d)
    vecs = bk[probe_ids]                       # [B, nprobe, cap, D]
    ids = bucket_ids[probe_ids]                # [B, nprobe, cap]
    scores = jnp.einsum(
        "bd,bpcd->bpc", queries.astype(jnp.float32), vecs.astype(jnp.float32)
    )
    scores = jnp.where(ids >= 0, scores, NEG_INF)
    b = queries.shape[0]
    flat_s = scores.reshape(b, -1)
    flat_i = ids.reshape(b, -1)
    vals, pos = jax.lax.top_k(flat_s, k)
    return vals, jnp.take_along_axis(flat_i, pos, axis=-1)
