"""Int8 / int4 quantized scoring: 1/2 and 1/4 the HBM traffic of bf16.

The flat kernel is HBM-bandwidth bound (ops/scoring.py), so storage dtype is
the throughput lever: int8 corpus + per-row scales reads ~1/2 the bytes of
bf16 per scan; nibble-packed int4 reads ~1/4. Quantization is symmetric
per-row (scale = max|x| / 127 or / 7); the kernels run the MXU in
int8 x int8 -> int32 and rescale the tile with the row scales. int4 packs
two codes per byte in a split-half layout (low nibble = dim j, high nibble =
dim j + D/2) so unpacking is two VPU shifts and scoring is two MXU dots —
no lane-axis interleave. Recall parity vs f32 is asserted in tests and
measured in the bench (BASELINE config 4); int4 is meant to be paired with
``rerank_factor`` (exact f16 host rerank) to buy back the last recall points.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mediquery_rag_tpu.ops.scoring import (
    LANE, NEG_INF, _merge_tile_sorted, _on_tpu, _round_up,
)


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 quantization. Returns (q [N,D] i8, scale [N] f32)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_topk_kernel(nv_ref, q_ref, qs_ref, c_ref, cs_ref,
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
    # rescale: row scale of query x row scale of corpus tile
    scores = raw.astype(jnp.float32) * qs_ref[:] * cs_ref[:].reshape(1, tile_c)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + ci * tile_c
    scores = jnp.where(col < n_valid, scores, NEG_INF)

    _merge_tile_sorted(scores, col, k, out_s_ref, out_i_ref, sc_ref, flag_ref)


@functools.partial(
    jax.jit, static_argnames=("k", "query_tile", "corpus_tile", "interpret")
)
def _int8_search_padded(q8, qscale, c8, cscale, n_valid, *,
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
            pl.BlockSpec((query_tile, 1), lambda i, j, nv: (i, 0),
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
    )(n_valid, q8, qscale, c8, cscale)
    return out_s, out_i


def quantize_rows_int4(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int4, two codes packed per byte (split-half layout).

    Byte ``j`` of a row stores dim ``j``'s code BIASED by +8 in the low
    nibble (``ulo = lo + 8`` in [1, 15]) and dim ``j + D/2``'s code signed
    in the high nibble: ``byte = 16*hi + ulo``. The bias makes the score
    LINEAR in quantities the MXU can consume raw (see ``_int4_topk_kernel``):

        16 * (q_lo.lo + q_hi.hi) = 16*(q_lo.ulo) + q_hi.byte - q_hi.ulo
                                   - 128*sum(q_lo)

    so the kernel's only VPU unpack work is ``ulo = byte & 15`` (the packed
    byte itself feeds one of the three int8 dots directly). A sign-extending
    unpack costs ~7 VPU passes per tile and made the scan ALU-bound (1.6 ms
    per 1M-row batch, slower than int8); this form is 3 passes.
    Returns (packed ``[N, D/2]`` i8, scale ``[N]`` f32); requires even D.
    """
    xf = x.astype(jnp.float32)
    d = xf.shape[-1]
    if d % 2:
        raise ValueError(f"int4 packing needs even dim, got {d}")
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(xf / scale[:, None]), -7, 7).astype(jnp.int32)
    lo, hi = q[:, : d // 2], q[:, d // 2:]
    packed = ((hi * 16) + (lo + 8)).astype(jnp.int8)    # in [-111, 127]
    return packed, scale


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of the split-half packing: ``[N, D/2]`` i8 -> ``[N, D]`` i32."""
    p = packed.astype(jnp.int32)
    lo = (p & 15) - 8                       # low nibble is biased unsigned
    hi = p >> 4                             # arithmetic shift (ulo >= 0)
    return jnp.concatenate([lo, hi], axis=-1)


def dequantize_int4(packed: jax.Array, scale: jax.Array) -> jax.Array:
    """``[N, D/2]`` i8 + ``[N]`` f32 -> ``[N, D]`` f32."""
    return unpack_int4(packed).astype(jnp.float32) * scale[:, None]


def _int4_topk_kernel(nv_ref, q_ref, qs16_ref, corr_ref, c_ref, cs_ref,
                      out_s_ref, out_i_ref, sc_ref, flag_ref, *, k, tile_c):
    n_valid = nv_ref[0]
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.zeros_like(out_i_ref)

    # one VPU mask pass (ulo = byte & 15), then three int8 MXU dots; the
    # packed byte feeds the second dot raw. With the +8 low-nibble bias
    # (see quantize_rows_int4):
    #   16*raw = 16*(q_lo.ulo) + q_hi.byte - q_hi.ulo - corr,
    #   corr = 128*sum(q_lo)   (precomputed per query row)
    dh = c_ref.shape[1]
    p = c_ref[:]                                        # [Tc, Dh] i8 packed
    ulo = p & 15    # i8-native on the VPU (Mosaic rejects i8 shifts, not &)
    q = q_ref[:]                                        # [Bq, D] i8
    q_lo, q_hi = q[:, :dh], q[:, dh:]
    dims = (((1,), (1,)), ((), ()))
    raw16 = 16 * jax.lax.dot_general(q_lo, ulo, dimension_numbers=dims,
                                     preferred_element_type=jnp.int32)
    raw16 += jax.lax.dot_general(q_hi, p, dimension_numbers=dims,
                                 preferred_element_type=jnp.int32)
    raw16 -= jax.lax.dot_general(q_hi, ulo, dimension_numbers=dims,
                                 preferred_element_type=jnp.int32)
    # qs16 = query_scale / 16 folds the 16x away; corr is exact in f32
    scores = ((raw16.astype(jnp.float32) - corr_ref[:]) * qs16_ref[:]
              * cs_ref[:].reshape(1, tile_c))
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + ci * tile_c
    scores = jnp.where(col < n_valid, scores, NEG_INF)

    _merge_tile_sorted(scores, col, k, out_s_ref, out_i_ref, sc_ref, flag_ref)


@functools.partial(
    jax.jit, static_argnames=("k", "query_tile", "corpus_tile", "interpret")
)
def _int4_search_padded(q8, qscale16, qcorr, c4, cscale, n_valid, *,
                        k, query_tile, corpus_tile, interpret):
    bq, d = q8.shape
    nc, dh = c4.shape
    grid = (bq // query_tile, nc // corpus_tile)
    kp = LANE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((query_tile, d), lambda i, j, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, 1), lambda i, j, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, 1), lambda i, j, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((corpus_tile, dh), lambda i, j, nv: (j, 0),
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
        functools.partial(_int4_topk_kernel, k=k, tile_c=corpus_tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bq, kp), jnp.float32),
            jax.ShapeDtypeStruct((bq, kp), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * bq * dh * nc * 2,
            bytes_accessed=bq * d + nc * dh + nc * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_valid, q8, qscale16, qcorr, c4, cscale)
    return out_s, out_i


def int4_flat_search(
    queries: jax.Array,
    corpus_q: jax.Array,       # [N_pad, D/2] i8 nibble-packed (pad rows zero)
    corpus_scale: jax.Array,   # [N_pad] f32
    k: int,
    *,
    n_valid: int | jax.Array | None = None,
    query_tile: int = 128,
    corpus_tile: int = 2048,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over a nibble-packed int4 corpus (1/4 the bytes of bf16).

    Queries are quantized to int8 on the fly — asymmetric precision (i8
    query x i4 corpus) keeps the query side essentially lossless, so all
    quantization error lives in the corpus codes.
    """
    if k > LANE:
        raise ValueError(f"k={k} > {LANE}")
    b, d2 = queries.shape
    n_pad, dh = corpus_q.shape
    if d2 != 2 * dh:
        raise ValueError(f"query dim {d2} != 2 x packed dim {dh}")
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
        qs = jnp.pad(qs, ((0, bq - b),))
    # bias correction 128*sum(q_lo): <= 128*127*D/2 < 2^24, exact in f32
    corr = (128 * jnp.sum(q8[:, :dh].astype(jnp.int32), axis=1,
                          keepdims=True)).astype(jnp.float32)

    s, i = _int4_search_padded(
        q8, (qs / 16.0).reshape(bq, 1), corr,
        corpus_q, corpus_scale.reshape(1, n_pad),
        n_valid,
        k=k, query_tile=query_tile, corpus_tile=corpus_tile,
        interpret=interpret,
    )
    return s[:b, :k], i[:b, :k]


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
        qs = jnp.pad(qs, ((0, bq - b),))

    s, i = _int8_search_padded(
        q8, qs.reshape(bq, 1), corpus_q, corpus_scale.reshape(1, n_pad),
        n_valid,
        k=k, query_tile=query_tile, corpus_tile=corpus_tile,
        interpret=interpret,
    )
    return s[:b, :k], i[:b, :k]
