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


def quant_matvec(
    x: jax.Array,          # [B, D] activations (any float dtype)
    w8: jax.Array,         # [F, D] int8, TRANSPOSED (out, in)
    scales: jax.Array,     # [F] f32 per-output-channel
    *,
    out_tile: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """``x @ W`` with int8-streamed weights. Returns [B, F] f32."""
    if interpret is None:
        interpret = not _on_tpu()
    b, d = x.shape
    f = w8.shape[0]
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
    out = _matvec_padded(x8, w8, scales.reshape(1, f),
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


def quantize_decoder_params(params):
    """Weight-only int8 for LM serving: every big matmul weight becomes
    ``{"q": [.., out, in] i8, "s": [.., out] f32}`` (models/decoder._mm
    consumes either form). Pure — compose with init under one jit at 7B+
    scale so the float tree never coexists with the quantized one.
    Stacked per-layer weights convert layer-by-layer (``lax.map``) to keep
    the f32 transient at one layer, not L layers.
    """
    def q2(w):
        q, s = quantize_weight(w)
        return {"q": q, "s": s}

    def q3(w):                                          # [L, in, out]
        q, s = jax.lax.map(quantize_weight, w)
        return {"q": q, "s": s}

    out = dict(params)
    out["blocks"] = dict(params["blocks"])
    for k in ("qkv", "attn_out", "w_gate", "w_up", "w_down"):
        out["blocks"][k] = q3(params["blocks"][k])
    out["lm_head"] = q2(params["lm_head"])
    return out
