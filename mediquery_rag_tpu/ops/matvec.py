"""Quantized weight-streaming matvec for LM decode.

B=1 decode is weight-BANDWIDTH bound: every token re-reads all params, so
tok/s ~ HBM_BW / weight_bytes. XLA cannot stream int8 weights at byte rate
through a plain dot — measured on v5e (D=4096, F=11008 matvec): bf16 dot
629 GB/s effective, `w8.astype(bf16) * s` dequant-into-dot only 288 GB/s
of int8 bytes (it materializes the bf16 copy), int8 `dot_general` 369 GB/s.
This Pallas kernel streams the int8 weight matrix HBM->VMEM tile by tile —
the same pattern as ops/quant.py's corpus scan, which sustains ~90% of
HBM bandwidth — and rescales with per-output-channel scales.

Weights are stored TRANSPOSED ``[out, in]`` so the contraction is over the
minor axis (the layout every scan kernel here uses); the activation is
int8-quantized per row on the fly (asymmetric precision: activation error
is negligible next to weight quantization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mediquery_rag_tpu.ops.scoring import _on_tpu, _round_up


def _matvec_kernel(x_ref, w_ref, s_ref, out_ref):
    x = x_ref[:]                                        # [Bp, D] i8
    w = w_ref[:]                                        # [tf, D] i8
    raw = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                   # [Bp, tf] i32
    out_ref[:] = raw.astype(jnp.float32) * s_ref[:]     # [1, tf] broadcast


@functools.partial(jax.jit, static_argnames=("out_tile", "interpret"))
def _matvec_padded(x8, w8, scales, *, out_tile, interpret):
    bp, d = x8.shape
    f = w8.shape[0]
    grid = (f // out_tile,)
    out = pl.pallas_call(
        _matvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bp, d), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_tile, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_tile), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, out_tile), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * d * f,
            bytes_accessed=bp * d + f * d + f * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x8, w8, scales)
    return out


def _matvec_stacked_kernel(l_ref, x_ref, w_ref, s_ref, out_ref):
    x = x_ref[:]                                        # [Bp, D] i8
    w = w_ref[0]                                        # [tf, D] i8
    raw = jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                   # [Bp, tf] i32
    out_ref[:] = raw.astype(jnp.float32) * s_ref[0]     # [1, tf] broadcast


@functools.partial(jax.jit, static_argnames=("out_tile", "interpret"))
def _matvec_stacked_padded(layer, x8, w8, scales, *, out_tile, interpret):
    """One layer's matvec out of STACKED ``[L, F, D]`` weights.

    The layer index rides as a scalar-prefetch input and selects the
    weight/scale blocks in the index map — the kernel DMAs exactly that
    layer's tiles straight from the resident stacked array. This is what
    lets the decoder's layer loop keep the whole weight tree as a loop
    constant: putting stacked weights in ``lax.scan`` xs instead makes
    XLA materialize every per-layer dynamic-slice as an HBM copy (an
    extra write+read of all 6.5 GB per decode step at 7B — measured
    ~2x the step time)."""
    bp, d = x8.shape
    L, f, _ = w8.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f // out_tile,),
        in_specs=[
            pl.BlockSpec((bp, d), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_tile, d), lambda j, l: (l[0], j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, out_tile), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, out_tile), lambda j, l: (0, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _matvec_stacked_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * d * f,
            bytes_accessed=bp * d + f * d + f * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer, x8, w8, scales.reshape(L, 1, f))


def quant_matvec(
    x: jax.Array,          # [B, D] activations (any float dtype)
    w8: jax.Array,         # [F, D] int8, TRANSPOSED (out, in) — or
                           # [L, F, D] stacked per-layer with ``layer``
    scales: jax.Array,     # [F] f32 per-output-channel ([L, F] stacked)
    *,
    layer: jax.Array | None = None,   # i32 scalar — selects the layer of
                           # stacked weights via scalar prefetch
    out_tile: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """``x @ W`` with int8-streamed weights. Returns [B, F] f32."""
    if interpret is None:
        interpret = not _on_tpu()
    b, d = x.shape
    f = w8.shape[-2]
    out_tile = min(out_tile, f)
    if f % out_tile:                 # vocab- and head-sized dims: fall back
        out_tile = 128 if f % 128 == 0 else f

    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    qs = jnp.maximum(amax, 1e-12) / 127.0
    x8 = jnp.clip(jnp.round(xf / qs[:, None]), -127, 127).astype(jnp.int8)
    bp = _round_up(max(b, 32), 32)                      # i8 sublane tile
    if bp != b:
        x8 = jnp.pad(x8, ((0, bp - b), (0, 0)))
    if layer is None:
        out = _matvec_padded(x8, w8, scales.reshape(1, f),
                             out_tile=out_tile, interpret=interpret)
    else:
        out = _matvec_stacked_padded(
            jnp.asarray(layer, jnp.int32).reshape(1), x8, w8, scales,
            out_tile=out_tile, interpret=interpret)
    return out[:b] * qs[:, None]


def quantize_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """``[in, out]`` float -> (``[out, in]`` i8, ``[out]`` f32 scales).
    Symmetric per-output-channel; the transpose bakes the kernel layout."""
    wt = w.astype(jnp.float32).T                        # [out, in]
    amax = jnp.max(jnp.abs(wt), axis=-1)
    s = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(wt / s[:, None]), -127, 127).astype(jnp.int8)
    return q, s


# -- int4 weight streaming ----------------------------------------------------
#
# The reference serves its LLM through Ollama, whose default GGUF quant for
# qwen2.5:7b is 4-bit (Q4_K_M) — so 4-bit weight-only is the parity point,
# not just an optimization (/root/reference/src/medical_engine.py:46). Decode
# is weight-bandwidth bound, so int4 halves int8's bytes again: a 7B-class
# model in ~3.8 GB with a ~2x B=1 tok/s ceiling over int8.
#
# Layout reuses the corpus scan's proven nibble trick (ops/quant.py:117):
# pack output channels r (low nibble, code biased +8) and r + F/2 (high
# nibble, signed) into byte-row r of a [F/2, D] i8 matrix. One `& 15` VPU
# pass + two int8 MXU dots per tile score BOTH halves:
#
#     dotU = x8 . (byte & 15)   ->  low  half = dotU - 8*sum(x8)
#     dotP = x8 . byte          ->  high half = (dotP - dotU) / 16
#
# Quality: naive per-output-channel int4 (RTN) is visibly lossy because
# weight magnitude varies along the INPUT axis too. Group-wise scales (the
# GGML/GPTQ answer) would break the single-dot structure, so instead an
# AWQ-style per-input-dim equalizer ``t[d] = (max_r |w[r,d]|)^alpha`` is
# divided out of the weights before quantization and multiplied into the
# activation at run time (one [B, D] elementwise op — free next to the
# weight stream). This captures the input-axis spread that group scales
# exist for while keeping the kernel exactly two dots.


def quantize_weight_int4(w: jax.Array, *, alpha: float = 0.5):
    """``[in, out]`` float -> int4-packed serving form.

    Returns ``{"q4": [out/2, in] i8 nibble-packed, "s": [2, out/2] f32
    per-channel scale planes (0 = channels [0, F/2), 1 = [F/2, F)),
    "t": [1, in] f32 activation equalizer}``. ``out`` must be even.
    """
    wt = w.astype(jnp.float32).T                        # [F, D]
    f, d = wt.shape
    if f % 2:
        raise ValueError(f"int4 packing needs an even out dim, got {f}")
    amax_d = jnp.maximum(jnp.max(jnp.abs(wt), axis=0), 1e-12)   # [D]
    t = amax_d ** alpha
    t = t / jnp.exp(jnp.mean(jnp.log(t)))               # scale-neutral
    wn = wt / t[None, :]
    s = jnp.maximum(jnp.max(jnp.abs(wn), axis=-1), 1e-12) / 7.0  # [F]
    c = jnp.clip(jnp.round(wn / s[:, None]), -7, 7).astype(jnp.int32)
    f2 = f // 2
    lo, hi = c[:f2], c[f2:]
    packed = (hi * 16 + (lo + 8)).astype(jnp.int8)      # [F/2, D]
    s2 = jnp.stack([s[:f2], s[f2:]])                    # [2, F/2]
    return {"q4": packed, "s": s2, "t": t.reshape(1, d)}


def dequantize_weight_int4(wq, dtype=jnp.float32) -> jax.Array:
    """Serving form -> ``[out, in]`` dense weights (prefill/scoring path,
    where the matmul is MXU- not bandwidth-bound)."""
    p = wq["q4"].astype(jnp.int32)
    lo = (p & 15) - 8
    hi = (p - (lo + 8)) // 16         # exact: byte = 16*hi + (lo + 8)
    codes = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    s = wq["s"].reshape(-1)                             # [F] plane-ordered
    return (codes * s[:, None] * wq["t"]).astype(dtype)


def _matvec4_kernel(x_ref, corr_ref, w_ref, s_ref, lo_ref, hi_ref):
    p = w_ref[:]                                        # [tf2, D] i8 packed
    ulo = p & 15    # i8-native on the VPU (Mosaic rejects i8 shifts, not &)
    x = x_ref[:]                                        # [Bp, D] i8
    dims = (((1,), (1,)), ((), ()))
    dotU = jax.lax.dot_general(x, ulo, dimension_numbers=dims,
                               preferred_element_type=jnp.int32)
    dotP = jax.lax.dot_general(x, p, dimension_numbers=dims,
                               preferred_element_type=jnp.int32)
    # (dotP - dotU) is exact in i32 and a multiple of 16; the /16 folds
    # into the f32 rescale. f32 rounding past 2^24 is ~6e-8 relative —
    # noise next to the int4 quantization error itself.
    lo_ref[:] = ((dotU.astype(jnp.float32) - corr_ref[:])
                 * s_ref[0:1, :])
    hi_ref[:] = ((dotP - dotU).astype(jnp.float32) * 0.0625
                 * s_ref[1:2, :])


@functools.partial(jax.jit, static_argnames=("out_tile", "interpret"))
def _matvec4_padded(x8, corr, w4, s2, *, out_tile, interpret):
    bp, d = x8.shape
    f2 = w4.shape[0]
    grid = (f2 // out_tile,)
    lo, hi = pl.pallas_call(
        _matvec4_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bp, d), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_tile, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, out_tile), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bp, out_tile), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, out_tile), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((bp, f2), jnp.float32),
                   jax.ShapeDtypeStruct((bp, f2), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * d * f2,                      # two dots
            bytes_accessed=bp * d + f2 * d + f2 * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x8, corr, w4, s2)
    return lo, hi


def _matvec4_stacked_kernel(l_ref, x_ref, corr_ref, w_ref, s_ref,
                            lo_ref, hi_ref):
    p = w_ref[0]                                        # [tf2, D] i8 packed
    ulo = p & 15
    x = x_ref[:]                                        # [Bp, D] i8
    dims = (((1,), (1,)), ((), ()))
    dotU = jax.lax.dot_general(x, ulo, dimension_numbers=dims,
                               preferred_element_type=jnp.int32)
    dotP = jax.lax.dot_general(x, p, dimension_numbers=dims,
                               preferred_element_type=jnp.int32)
    s = s_ref[0]                                        # [2, tf2]
    lo_ref[:] = ((dotU.astype(jnp.float32) - corr_ref[:]) * s[0:1, :])
    hi_ref[:] = ((dotP - dotU).astype(jnp.float32) * 0.0625 * s[1:2, :])


@functools.partial(jax.jit, static_argnames=("out_tile", "interpret"))
def _matvec4_stacked_padded(layer, x8, corr, w4, s2, *, out_tile, interpret):
    """int4 analogue of :func:`_matvec_stacked_padded` — one layer out of
    ``[L, F/2, D]`` packed weights, selected via scalar prefetch."""
    bp, d = x8.shape
    L, f2, _ = w4.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(f2 // out_tile,),
        in_specs=[
            pl.BlockSpec((bp, d), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_tile, d), lambda j, l: (l[0], j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, out_tile), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bp, out_tile), lambda j, l: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, out_tile), lambda j, l: (0, j),
                         memory_space=pltpu.VMEM),
        ],
    )
    lo, hi = pl.pallas_call(
        _matvec4_stacked_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bp, f2), jnp.float32),
                   jax.ShapeDtypeStruct((bp, f2), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * d * f2,
            bytes_accessed=bp * d + f2 * d + f2 * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer, x8, corr, w4, s2)
    return lo, hi


def quant_matvec_int4(
    x: jax.Array,          # [B, D] activations (any float dtype)
    wq: dict,              # quantize_weight_int4 output (stacked [L, ...]
                           # leaves with ``layer``)
    *,
    layer: jax.Array | None = None,
    out_tile: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """``x @ W`` with int4-streamed weights. Returns [B, F] f32."""
    if interpret is None:
        interpret = not _on_tpu()
    b, d = x.shape
    f2 = wq["q4"].shape[-2]
    out_tile = min(out_tile, f2)
    if f2 % out_tile:   # small/odd-sized projections: one full-array block
        out_tile = 128 if f2 % 128 == 0 else f2

    t = wq["t"] if layer is None else jax.lax.dynamic_index_in_dim(
        wq["t"], layer, 0, keepdims=False)              # [1, D] equalizer
    xf = x.astype(jnp.float32) * t
    amax = jnp.max(jnp.abs(xf), axis=-1)
    qs = jnp.maximum(amax, 1e-12) / 127.0
    x8 = jnp.clip(jnp.round(xf / qs[:, None]), -127, 127).astype(jnp.int8)
    bp = _round_up(max(b, 32), 32)                      # i8 sublane tile
    if bp != b:
        x8 = jnp.pad(x8, ((0, bp - b), (0, 0)))
    corr = 8.0 * jnp.sum(x8.astype(jnp.int32), axis=-1,
                         keepdims=True).astype(jnp.float32)   # [Bp, 1]
    if layer is None:
        lo, hi = _matvec4_padded(x8, corr, wq["q4"], wq["s"],
                                 out_tile=out_tile, interpret=interpret)
    else:
        lo, hi = _matvec4_stacked_padded(
            jnp.asarray(layer, jnp.int32).reshape(1), x8, corr,
            wq["q4"], wq["s"], out_tile=out_tile, interpret=interpret)
    out = jnp.concatenate([lo[:b], hi[:b]], axis=-1)    # split-half order
    return out * qs[:b, None]


def quantize_decoder_params(params, bits: int = 8,
                            fuse_gateup: bool | None = None):
    """Weight-only quantization for LM serving: every big matmul weight
    becomes ``{"q": [.., out, in] i8, "s": [.., out] f32}`` (``bits=8``) or
    the int4 form ``{"q4", "s", "t"}`` (``bits=4`` — quantize_weight_int4;
    models/decoder._mm consumes all three forms). Pure — compose with init
    under one jit at 7B+ scale so the float tree never coexists with the
    quantized one. Stacked per-layer weights convert layer-by-layer
    (``lax.map``) to keep the f32 transient at one layer, not L layers.

    ``fuse_gateup`` concatenates gate‖up along the out axis into ONE
    ``w_gateup`` matrix before quantizing (channel order [gate | up]) —
    the decode step then streams both projections in one Pallas dispatch
    with one activation quantization instead of two (VERDICT r2 item 3;
    models/decoder._mlp_ff splits the output). Default: on at int8 —
    per-output-channel scales make it mathematically lossless — and OFF
    at int4, where the two matrices would have to share one per-input-dim
    equalizer ``t`` (measured top-1-vs-float agreement dropped 0.81→0.69
    on the tiny test model; pass ``fuse_gateup=True`` explicitly to trade
    that quality for the dispatch fusion).
    """
    if fuse_gateup is None:
        fuse_gateup = bits == 8
    if bits == 4:
        q2 = quantize_weight_int4
        q3 = lambda w: jax.lax.map(quantize_weight_int4, w)  # noqa: E731
    elif bits == 8:
        def q2(w):
            q, s = quantize_weight(w)
            return {"q": q, "s": s}

        def q3(w):                                      # [L, in, out]
            q, s = jax.lax.map(quantize_weight, w)
            return {"q": q, "s": s}
    else:
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    out = dict(params)
    out["blocks"] = dict(params["blocks"])
    mats = ["qkv", "attn_out", "w_down"]
    if fuse_gateup:
        def q3_pair(pair):                              # per-layer concat
            wg, wu = pair                               # [in, F] each
            if bits == 4:
                return quantize_weight_int4(
                    jnp.concatenate([wg, wu], axis=-1))
            q, s = quantize_weight(jnp.concatenate([wg, wu], axis=-1))
            return {"q": q, "s": s}

        out["blocks"]["w_gateup"] = jax.lax.map(
            q3_pair, (params["blocks"]["w_gate"], params["blocks"]["w_up"]))
        del out["blocks"]["w_gate"], out["blocks"]["w_up"]
    else:
        mats += ["w_gate", "w_up"]
    for k in mats:
        out["blocks"][k] = q3(params["blocks"][k])
    out["lm_head"] = q2(params["lm_head"])
    return out
