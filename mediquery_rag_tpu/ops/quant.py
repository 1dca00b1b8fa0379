"""Int8 / int4 quantized scoring: 1/2 and 1/4 the HBM traffic of bf16.

The flat kernel is HBM-bandwidth bound (ops/scoring.py), so storage dtype is
the throughput lever: int8 corpus + per-row scales reads ~1/2 the bytes of
bf16 per scan; nibble-packed int4 reads ~1/4. Quantization is symmetric
per-row (scale = max|x| / 127 or / 7); the kernels run the MXU in
int8 x int8 -> int32 and rescale the tile with the row scales. int4 packs
two consecutive LOGICAL ROWS per byte-row (row-pair layout: low nibble =
row 2r biased +8, high nibble = row 2r+1 signed), so one packed tile scores
2x the logical rows of an int8 tile with the same two MXU dots — the MXU
work per logical row matches int8's while the HBM bytes halve. Measured on
v5e at 1M x 768 / B=64 / k=10: int8 1.11 ms per batch, int4 0.81 ms (77K
QPS); layouts that packed along the dim axis needed 3 dots of K=D/2 (1.5x
the MXU work) and were compute-bound at int8 speed. Recall parity vs f32 is
asserted in tests and measured in the bench (BASELINE config 4); int4 is
meant to be paired with ``rerank_factor`` (exact f16 host rerank) to buy
back the last recall points.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mediquery_rag_tpu.ops.scoring import (
    LANE, NEG_INF, _merge_tile_lazy, _on_tpu, _round_up,
)


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 quantization. Returns (q [N,D] i8, scale [N] f32)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_topk_kernel(nv_ref, q_ref, c_ref, cs_ref,
                      out_s_ref, out_i_ref, sc_ref, flag_ref, *, k, tile_c):
    n_valid = nv_ref[0]
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.zeros_like(out_i_ref)

    # MXU int8 path: [Bq, D] x [Tc, D]^T -> [Bq, Tc] i32
    raw = jax.lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # rescale by the CORPUS row scales only. The per-QUERY scale is a
    # positive per-row constant — it never changes a row's top-k ordering —
    # so it's applied to the k returned scores outside the kernel, saving
    # one [Bq, Tc] VPU pass per tile. Pad rows have zero codes AND zero
    # scales -> finite score 0.0; masked lazily in merge.
    scores = raw.astype(jnp.float32) * cs_ref[:].reshape(1, tile_c)
    _merge_tile_lazy([scores], k, out_s_ref, out_i_ref, sc_ref, flag_ref,
                     n_valid, base=ci * tile_c, stride=1)


@functools.partial(
    jax.jit, static_argnames=("k", "query_tile", "corpus_tile", "interpret")
)
def _int8_search_padded(q8, c8, cscale, n_valid, *,
                        k, query_tile, corpus_tile, interpret):
    bq, d = q8.shape
    nc = c8.shape[0]
    grid = (bq // query_tile, nc // corpus_tile)
    kp = LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((query_tile, d), lambda i, j, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((corpus_tile, d), lambda i, j, nv: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, corpus_tile), lambda i, j, nv: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((query_tile, kp), lambda i, j, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, kp), lambda i, j, nv: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((query_tile, corpus_tile), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out_s, out_i = pl.pallas_call(
        functools.partial(_int8_topk_kernel, k=k, tile_c=corpus_tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bq, kp), jnp.float32),
            jax.ShapeDtypeStruct((bq, kp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bq * d * nc,
            bytes_accessed=bq * d + nc * d + nc * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_valid, q8, c8, cscale)
    return out_s, out_i


def quantize_rows_int4(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int4, two LOGICAL ROWS packed per byte-row.

    Byte ``[r, j]`` stores logical row ``2r``'s code for dim ``j`` BIASED by
    +8 in the low nibble (``ulo = lo + 8`` in [1, 15]) and row ``2r+1``'s
    code signed in the high nibble: ``byte = 16*hi + ulo`` in [-111, 127].
    The bias makes BOTH rows' scores linear in quantities the MXU consumes
    raw (see ``_int4_topk_kernel``): with ``dotU = q . (byte & 15)`` and
    ``dotP = q . byte``,

        even-row score = dotU - 8*sum(q),    odd-row score = (dotP - dotU)/16

    so one packed tile covers 2x the logical rows of an int8 tile with the
    SAME per-logical-row MXU work (two dots of K=D over N/2 byte-rows), and
    the only VPU unpack is one ``& 15`` pass. A dim-axis split-half packing
    needed 3 dots of K=D/2 (1.5x the MXU work) and ran no faster than int8.
    Returns (packed ``[P, D]`` i8, scale planes ``[2, P]`` f32) with
    ``P = ceil(N/2)``; plane 0 holds even logical rows' scales, plane 1 odd.
    The plane layout is the STORAGE format — de-interleaving per search call
    would be a minor-dim transpose (~1 ms/1M rows on TPU, measured, which
    erased the entire int4 win). Odd N gets a zero phantom row (scores 0,
    masked by ``n_valid`` downstream).
    """
    xf = x.astype(jnp.float32)
    n = xf.shape[0]
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(xf / scale[:, None]), -7, 7).astype(jnp.int32)
    if n % 2:
        q = jnp.pad(q, ((0, 1), (0, 0)))
        scale = jnp.pad(scale, ((0, 1)), constant_values=1.0)
    lo, hi = q[0::2], q[1::2]
    packed = ((hi * 16) + (lo + 8)).astype(jnp.int8)
    scale2 = jnp.stack([scale[0::2], scale[1::2]])
    return packed, scale2


def int4_codes(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int4 CODES (unpacked, one per byte) + scales.

    The scatter-friendly intermediate for IVF builds: codes land in bucket
    slots like int8 rows, then :func:`ivf_pack_slots_int4` pairs them.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-12) / 7.0
    codes = jnp.clip(jnp.round(xf / scale[:, None]), -7, 7).astype(jnp.int8)
    return codes, scale


def ivf_pack_slots_int4(codes: jax.Array, nlist: int, cap: int) -> jax.Array:
    """Bucket-local split-half packing for IVF: slot ``j`` of a bucket goes
    to the LOW nibble (biased +8) of packed row ``j``, slot ``j + cap/2`` to
    the HIGH nibble — so the probe kernels' ``concat([even, odd])`` scores
    line up with the existing slot-ordered ``bucket_ids``/``bucket_scales``
    arrays with zero reordering. ``codes`` is ``[nlist*cap, D]`` (int4 codes
    in int8 bytes, slot order); returns ``[nlist*cap/2, D]`` i8.
    """
    if cap % 2:
        raise ValueError(f"int4 IVF needs even cap, got {cap}")
    d = codes.shape[1]
    # arithmetic stays in int8: hi*16 in [-112, 112], +lo+8 <= 127 — an
    # int32 upcast materializes a 4x buffer (33 GB at 10M, OOM)
    c3 = codes.reshape(nlist, cap, d).astype(jnp.int8)
    caph = cap // 2
    lo, hi = c3[:, :caph], c3[:, caph:]
    return ((hi * jnp.int8(16)) + (lo + jnp.int8(8))).reshape(
        nlist * caph, d)


def ivf_unpack_slots_int4(packed: jax.Array, nlist: int,
                          cap: int) -> jax.Array:
    """Inverse of :func:`ivf_pack_slots_int4`: ``[nlist*cap/2, D]`` i8 ->
    slot-ordered codes ``[nlist*cap, D]`` i8."""
    d = packed.shape[1]
    caph = cap // 2
    p = packed.reshape(nlist, caph, d).astype(jnp.int32)
    lo = (p & 15) - 8
    hi = p >> 4
    return jnp.concatenate([lo, hi], axis=1).reshape(
        nlist * cap, d).astype(jnp.int8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of the row-pair packing: ``[P, D]`` i8 -> ``[2P, D]`` i32."""
    p = packed.astype(jnp.int32)
    lo = (p & 15) - 8                       # low nibble is biased unsigned
    hi = p >> 4                             # arithmetic shift (ulo >= 0)
    ph, d = p.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * ph, d)


def dequantize_int4(packed: jax.Array, scale2: jax.Array,
                    n: int | None = None) -> jax.Array:
    """``[P, D]`` i8 + ``[2, P]`` scale planes -> ``[n, D]`` f32."""
    ph = packed.shape[0]
    n = 2 * ph if n is None else n
    scale = scale2.T.reshape(2 * scale2.shape[1])     # logical per-row order
    return (unpack_int4(packed)[:n].astype(jnp.float32)
            * scale[:n, None])


def _int4_topk_kernel(nv_ref, q_ref, corr_ref, c_ref, cs_ref,
                      out_s_ref, out_i_ref, sc_ref, flag_ref, *, k, tile_c):
    n_valid = nv_ref[0]
    ci = pl.program_id(1)
    th = tile_c // 2

    @pl.when(ci == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.zeros_like(out_i_ref)

    # one VPU mask pass, two int8 MXU dots covering tile_c LOGICAL rows
    # (th byte-rows)
    p = c_ref[:]                                        # [th, D] i8 packed
    ulo = p & 15    # i8-native on the VPU (Mosaic rejects i8 shifts, not &)
    q = q_ref[:]                                        # [Bq, D] i8
    dims = (((1,), (1,)), ((), ()))
    dotU = jax.lax.dot_general(q, ulo, dimension_numbers=dims,
                               preferred_element_type=jnp.int32)
    dotP = jax.lax.dot_general(q, p, dimension_numbers=dims,
                               preferred_element_type=jnp.int32)
    # both raws < 2^24: exact in f32 (|dotP| <= 127*127*768, dotU likewise).
    # The per-QUERY scale is a positive per-row constant — it never changes
    # a row's top-k ordering — so it's applied outside the kernel; the odd
    # plane's 1/16 folds into the tiny [1, th] scale-row op. Saves two
    # [Bq, th] VPU passes per tile (this kernel is compute-marginal at
    # B=64: the MXU runs at half utilization below 128 queries, so VPU
    # work is on the critical path, unlike the DMA-bound int8/bf16 scans).
    # Pad byte-rows are zero with zero scale planes -> finite score 0.0;
    # no per-tile masking here — the lazy merge masks under its flag.
    dU = dotU.astype(jnp.float32)
    even = (dU - corr_ref[:]) * cs_ref[0:1, :]
    odd = (dotP.astype(jnp.float32) - dU) * (cs_ref[1:2, :] * 0.0625)
    # scratch layout [even | odd]: position p of part t = logical column
    # ci*tile_c + 2*p + t
    _merge_tile_lazy([even, odd], k, out_s_ref, out_i_ref, sc_ref, flag_ref,
                     n_valid, base=ci * tile_c, stride=2)


@functools.partial(
    jax.jit, static_argnames=("k", "query_tile", "corpus_tile", "interpret")
)
def _int4_search_padded(q8, qcorr, c4, cscale2, n_valid, *,
                        k, query_tile, corpus_tile, interpret):
    bq, d = q8.shape
    nph = c4.shape[0]
    th = corpus_tile // 2
    grid = (bq // query_tile, nph // th)
    kp = LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((query_tile, d), lambda i, j, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, 1), lambda i, j, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, d), lambda i, j, nv: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, th), lambda i, j, nv: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((query_tile, kp), lambda i, j, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, kp), lambda i, j, nv: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((query_tile, corpus_tile), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    out_s, out_i = pl.pallas_call(
        functools.partial(_int4_topk_kernel, k=k, tile_c=corpus_tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bq, kp), jnp.float32),
            jax.ShapeDtypeStruct((bq, kp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bq * d * nph * 2,
            bytes_accessed=bq * d + nph * d + nph * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_valid, q8, qcorr, c4, cscale2)
    return out_s, out_i


def int4_flat_search(
    queries: jax.Array,
    corpus_q: jax.Array,       # [N_pad/2, D] i8 row-pair packed (pads zero)
    corpus_scale: jax.Array,   # [2, N_pad/2] f32 scale planes (even, odd)
    k: int,
    *,
    n_valid: int | jax.Array | None = None,
    query_tile: int = 128,
    corpus_tile: int = 4096,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over a row-pair-packed int4 corpus (1/4 the bytes of bf16).

    Queries are quantized to int8 on the fly — asymmetric precision (i8
    query x i4 corpus) keeps the query side essentially lossless, so all
    quantization error lives in the corpus codes. ``corpus_tile`` counts
    LOGICAL rows per kernel step (must be even; larger tiles amortize
    per-step overhead — 4096-6144 measured fastest at 1M x 768).
    """
    if k > LANE:
        raise ValueError(f"k={k} > {LANE}")
    b, d = queries.shape
    nph, dc = corpus_q.shape
    n_pad = 2 * nph
    if dc != d:
        raise ValueError(f"query dim {d} != packed corpus dim {dc}")
    if corpus_tile % 2:
        raise ValueError(f"int4 corpus_tile must be even, got {corpus_tile}")
    if n_pad % corpus_tile:
        raise ValueError(f"corpus rows {n_pad} % tile {corpus_tile} != 0")
    if corpus_scale.shape != (2, nph):
        raise ValueError(
            f"scale planes {corpus_scale.shape} != (2, {nph})")
    n_valid = n_pad if n_valid is None else n_valid
    n_valid = jnp.asarray(n_valid, jnp.int32).reshape((1,))
    if interpret is None:
        interpret = not _on_tpu()

    q8, qs = quantize_rows(queries)
    query_tile = min(query_tile, _round_up(max(b, 32), 32))  # i8 sublane tile 32
    bq = _round_up(b, query_tile)
    if bq != b:
        q8 = jnp.pad(q8, ((0, bq - b), (0, 0)))
    # bias correction 8*sum(q): <= 8*127*768 < 2^24, exact in f32
    corr = (8 * jnp.sum(q8.astype(jnp.int32), axis=1,
                        keepdims=True)).astype(jnp.float32)

    s, i = _int4_search_padded(
        q8, corr, corpus_q, corpus_scale, n_valid,
        k=k, query_tile=query_tile, corpus_tile=corpus_tile,
        interpret=interpret,
    )
    # kernel scores omit the per-query scale (ordering-invariant per row);
    # restore it here so returned scores match the dequantized dot product
    return s[:b, :k] * qs[:, None], i[:b, :k]


def int8_flat_search(
    queries: jax.Array,
    corpus_q: jax.Array,       # [N_pad, D] int8 (pad rows zero)
    corpus_scale: jax.Array,   # [N_pad] f32
    k: int,
    *,
    n_valid: int | jax.Array | None = None,
    query_tile: int = 128,
    corpus_tile: int = 2048,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over an int8 corpus. Queries are quantized on the fly."""
    if k > LANE:
        raise ValueError(f"k={k} > {LANE}")
    b, d = queries.shape
    n_pad = corpus_q.shape[0]
    if n_pad % corpus_tile:
        raise ValueError(f"corpus rows {n_pad} % tile {corpus_tile} != 0")
    n_valid = n_pad if n_valid is None else n_valid
    n_valid = jnp.asarray(n_valid, jnp.int32).reshape((1,))
    if interpret is None:
        interpret = not _on_tpu()

    q8, qs = quantize_rows(queries)
    query_tile = min(query_tile, _round_up(max(b, 32), 32))  # i8 sublane tile 32
    bq = _round_up(b, query_tile)
    if bq != b:
        q8 = jnp.pad(q8, ((0, bq - b), (0, 0)))

    s, i = _int8_search_padded(
        q8, corpus_q, corpus_scale.reshape(1, n_pad),
        n_valid,
        k=k, query_tile=query_tile, corpus_tile=corpus_tile,
        interpret=interpret,
    )
    # kernel scores omit the per-query scale (ordering-invariant per row);
    # restore it here so returned scores match the dequantized dot product
    return s[:b, :k] * qs[:, None], i[:b, :k]
