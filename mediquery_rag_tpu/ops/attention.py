"""Flash attention — fused online-softmax attention for prefill/training.

The decoder's einsum attention (models/decoder.py:_attend) materializes the
``[B, H, S, S]`` logits in f32 plus the ``[B, 1, S, S]`` mask bias. At the
serving default S=512 that is noise; at long-context prefill (S=4096,
7B-class: 28 heads) it is ~1.9 GB of HBM logits traffic per layer — the
prefill becomes bandwidth-bound on a tensor that exists only to be softmaxed
and immediately contracted away. (The reference outsourced this whole
problem to llama.cpp's C++ attention, reference src/medical_engine.py:46.)

This kernel computes the same attention without ever materializing the
``[S, S]`` plane:

- grid = (B, H, num_q_tiles, num_kv_tiles), KV minor: for a fixed query tile
  the KV tiles stream through VMEM while the accumulator (ctx, running max,
  running denominator) stays resident — the scoring-kernel pattern
  (ops/scoring.py) applied to attention.
- online softmax: per KV tile, rescale the accumulator by
  ``exp(m_old - m_new)`` and add ``exp(s - m_new) @ V`` — the classic
  flash-attention recurrence; both matmuls hit the MXU with f32 accumulation.
- the causal+padding mask is *computed* from iota + the ``[B, Sk]`` key mask
  inside the kernel (same ``(visible - 1) * 1e9`` bias formula as the einsum
  path) — the ``[B, 1, S, S]`` bias tensor never exists either.
- GQA fold: each KV group's ``g`` query heads are concatenated along the
  row axis ([B, KH, g*S, dh]), so one K/V tile feeds the whole group — the
  cache is read at its true KH-head size, never expanded (the einsum path's
  ``jnp.repeat`` materializes ``g``x the cache, which dominates
  long-context decode HBM traffic).
- query offset (scalar-prefetch ``[B]`` i32): query row ``r`` of batch ``b``
  sits at key column ``q_offset[b] + r`` — offset 0 is ordinary causal
  prefill; ``col0`` is the chunked-prefill/prefix-cache continuation
  (``Decoder.prefill_extend``), where a fresh suffix attends over the
  lane's whole cache. Key length is independent of query length for the
  same reason.
- causal skip: KV tiles strictly above the (offset) diagonal skip their
  compute under ``pl.when`` — ~2x at long S (their DMA still runs;
  acceptable because the skipped tiles are the cheap half of a
  bandwidth-bound loop).

Training: ``flash_attention`` carries a custom VJP whose backward is also
Pallas (``_flash_bwd_call``): a KV-minor dQ pass that produces the
logsumexp online, and a Q-minor dK/dV pass that reconstructs P from it —
``[S, S]`` is never materialized in either direction, so long-context
fine-tuning (LoRA/distill) fits where the einsum backward's per-layer
``[B, H, S, S]`` would not. Both passes run in the transposed ``K @ Q^T``
orientation so every per-query quantity (running max/denominator, D,
logsumexp) lives on the lane axis — no sublane<->lane transposes.
``flash_attention_at`` / ``flash_attention_cached`` (the serving variants)
are not differentiable.

Off-TPU the kernel auto-selects Pallas interpret mode (pure XLA ops — this
is also what makes it partitionable on the virtual CPU mesh); on-chip it
compiles via Mosaic. CLAUDE.md rule applies: interpret mode does not check
Mosaic tiling, so any change here must be driven once on the real chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mediquery_rag_tpu.ops.scoring import _on_tpu, _round_up

LANE = 128
_NEG_BIG = -1e30


def _flash_kernel(off_ref, li_ref, q_ref, k_ref, v_ref, mask_ref, *rest,
                  scale, causal, tq, tk, sq, quant, ml=False):
    # li_ref: [1] i32 layer index — consumed entirely by the BlockSpec
    # index maps (selects the layer's K/V tiles out of a stacked cache);
    # the kernel body never reads it.
    if quant:
        # int8 KV cache: k/v tiles are int8 codes; ks/vs are the per-column
        # per-KV-head absmax scales (models/decoder.py:_kv_quantize). The
        # codes stream from HBM at 1 byte/elt and are cast in VMEM; the
        # scales fold into the logits (K) and softmax weights (V) exactly
        # like the einsum path (_cached_attn int8 branch).
        ks_ref, vs_ref, *rest = rest
    if ml:
        # un-normalized flash state outputs: callers fold extra columns
        # (e.g. the decode step's fresh K/V, not yet in the cache) into the
        # softmax outside the kernel via the standard (o, m, l) combine
        o_ref, mo_ref, lo_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
    # GQA fold: the caller concatenates each KV group's g query heads along
    # the row axis ([B, KH, g*sq, dhp]), so one grid visit per (b, kh, j)
    # reads the K/V tile ONCE for the whole group — K/V are never expanded
    # (jnp.repeat in the einsum path materializes g x the cache per step,
    # the dominant HBM cost of long-context decode). Folded row r maps to
    # sequence position r % sq (sq = padded per-head query length).
    b = pl.program_id(0)
    i = pl.program_id(2)
    j = pl.program_id(3)
    nk = pl.num_programs(3)
    off = off_ref[b]

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_BIG)
        l_ref[:] = jnp.zeros_like(l_ref)

    def _tile():
        q = q_ref[0, 0]                                   # [tq, dhp]
        k_t = k_ref[0, 0]                                 # [tk, dhp]
        if quant:
            k_t = k_t.astype(q.dtype)     # codes <=127: exact even in bf16
        s = jax.lax.dot_general(
            q, k_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [tq, tk]
        if quant:
            s = s * ks_ref[0, 0]                          # [1, tk] K scales
        vis = mask_ref[0] > 0.0                           # [1, tk]
        if causal:
            rows = off + (i * tq + jax.lax.broadcasted_iota(
                jnp.int32, (tq, tk), 0)) % sq             # key col of query r
            cols = j * tk + jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
            vis = vis & (cols <= rows)
        # same bias formula as the einsum path: -1e9, not -inf, so a row
        # with no visible keys (left-pad query over left-pad keys) softmaxes
        # to uniform garbage instead of NaN — callers ignore those rows
        s = s + (vis.astype(jnp.float32) - 1.0) * 1e9

        m_old = m_ref[:, :1]                              # [tq, 1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m_old - m_new)                     # [tq, 1]
        p = jnp.exp(s - m_new)                            # [tq, tk]
        l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
        # cast the (un-normalized, <=1) weights to the V dtype for the MXU —
        # mirrors the einsum path's softmax(...).astype(adt) @ V; the int8
        # path folds the V scales into the weights first (w * vs, then cast)
        if quant:
            pw = (p * vs_ref[0, 0]).astype(q.dtype)
            v_t = v_ref[0, 0].astype(q.dtype)
        else:
            pw, v_t = p.astype(v_ref.dtype), v_ref[0, 0]
        pv = jax.lax.dot_general(
            pw, v_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [tq, dhp]
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    if causal:
        # tile fully above the (offset) diagonal -> nothing visible, skip.
        # max sequence position in this tile: tiles either sit inside one
        # head's sq rows (sq % tq == 0) or span whole heads (tq >= sq) —
        # both chosen by the caller, never a partial straddle
        mx = sq - 1 if tq >= sq else (i * tq) % sq + tq - 1
        @pl.when(j * tk <= off + mx)
        def _():
            _tile()
    else:
        _tile()

    @pl.when(j == nk - 1)
    def _finish():
        # emit the input dtype: callers cast to the activation dtype anyway,
        # and a f32 [B, H, S, dh] output doubles peak HBM at long S x batch
        o_ref[0, 0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)
        if ml:
            mo_ref[0, 0] = m_ref[:]
            lo_ref[0, 0] = l_ref[:]


def _flash_cached_kernel(off_ref, li_ref, *args,
                         scale, nh, tq, tk, quant, ml, fresh=False):
    """Mask-only cached attention, ``nh`` KV heads per grid visit.

    The compact-fold decode tile is tiny (tq=16 rows at 7B GQA), so the
    per-visit cost is DMA + a fixed ~0.4 us of dispatch/semaphore work;
    at int8's 1 byte/elt the fixed cost was ~35-50% of the visit
    (r4: 46-61% of KV floor). Merging the KV-head axis into the block
    (static ``for h in range(nh)`` over a [1, nh, tk, dhp] tile) cuts
    visit count ``nh``x at the same total bytes. off_ref/li_ref are
    scalar prefetch: off unused (no causal term), li selects the stacked
    cache layer in the index maps."""
    del off_ref
    if fresh:
        # decode's fresh-token K/V column, not yet in the cache, folded
        # into the softmax IN-kernel as one extra virtual column at the
        # last KV tile — replaces the decoder's per-layer (o, m, l)
        # combine: no m/l state emission, no post-kernel fusions, and the
        # garbage-not-NaN clamp lives here. kn/vn are FLOAT (bf16) even
        # for an int8 cache (the column is quantized only when written);
        # gate_ref ([B] f32, scalar prefetch — Mosaic's block-tiling rule
        # rejects a (1, 1) VMEM block over [B, 1]) zeroes inactive
        # lanes' fresh term.
        gate_ref, *args = args
    q_ref, k_ref, v_ref, mask_ref, *rest = args
    if quant:
        ks_ref, vs_ref, *rest = rest
    if fresh:
        kn_ref, vn_ref, *rest = rest
    if ml:
        o_ref, mo_ref, lo_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
    j = pl.program_id(3)
    nk = pl.num_programs(3)
    # read program_id/SMEM at body top level — primitives inside a
    # pl.when branch do not lower in interpret mode
    act = gate_ref[pl.program_id(0)] if fresh else None

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_BIG)
        l_ref[:] = jnp.zeros_like(l_ref)

    bias = (mask_ref[0].astype(jnp.float32) - 1.0) * 1e9   # [1, tk]
    for h in range(nh):
        rows = slice(h * tq, (h + 1) * tq)
        q = q_ref[0, h]                                    # [tq, dhp]
        k_t = k_ref[0, h]                                  # [tk, dhp]
        if quant:
            k_t = k_t.astype(q.dtype)    # codes <=127: exact even in bf16
        s = jax.lax.dot_general(
            q, k_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # [tq, tk]
        if quant:
            s = s * ks_ref[0, h]                           # [1, tk]
        s = s + bias
        m_old = m_ref[rows, :1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(s - m_new)
        l_ref[rows] = l_ref[rows] * corr + jnp.sum(p, axis=1, keepdims=True)
        if quant:
            pw = (p * vs_ref[0, h]).astype(q.dtype)
            v_t = v_ref[0, h].astype(q.dtype)
        else:
            pw, v_t = p.astype(v_ref.dtype), v_ref[0, h]
        pv = jax.lax.dot_general(
            pw, v_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [tq, dhp]
        acc_ref[rows] = acc_ref[rows] * corr + pv
        m_ref[rows] = jnp.broadcast_to(m_new, (tq, m_ref.shape[1]))

    @pl.when(j == nk - 1)
    def _finish():
        for h in range(nh):
            rows = slice(h * tq, (h + 1) * tq)
            if fresh:
                q = q_ref[0, h]                            # [tq, dhp]
                kn = kn_ref[0, h]                          # [1, dhp]
                # multiply-reduce, not a dot: Mosaic rejects the 1-column
                # matmul here ('vector.broadcast' element-type mismatch)
                s2 = jnp.sum(q.astype(jnp.float32)
                             * kn.astype(jnp.float32),
                             axis=1, keepdims=True) * scale      # [tq, 1]
                m_old = m_ref[rows, :1]
                m = jnp.maximum(m_old, s2)
                a1 = jnp.exp(m_old - m) * l_ref[rows, :1]
                a2 = jnp.exp(s2 - m) * act
                ctx = (acc_ref[rows] * jnp.exp(m_old - m)
                       + a2 * vn_ref[0, h].astype(jnp.float32))
                # inactive lane + empty cache: both terms gate to 0 —
                # finite garbage, never NaN (the einsum path's contract)
                o_ref[0, h] = (ctx / jnp.maximum(a1 + a2, 1e-30)).astype(
                    o_ref.dtype)
            else:
                o_ref[0, h] = (acc_ref[rows] / l_ref[rows, :1]).astype(
                    o_ref.dtype)
            if ml:
                mo_ref[0, h] = m_ref[rows]
                lo_ref[0, h] = l_ref[rows]


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "tq", "tk", "interpret", "ml"))
def _flash_call(q, k, v, key_mask, q_offset, layer=None,
                k_scale=None, v_scale=None, fresh_k=None, fresh_v=None,
                fresh_gate=None, *,
                scale, causal, tq, tk, interpret, ml=False):
    B, H, S, dh = q.shape
    # K/V may be ONE layer [B, KH, C, dh] or a whole STACKED cache
    # [L, B, KH, C, dh] + ``layer`` ([1] i32): the layer index rides as a
    # second scalar-prefetch input and selects the layer's tiles in the
    # index maps — the decoder's layer loop keeps the multi-GB cache as a
    # loop constant instead of scan xs (whose per-layer dynamic-slices XLA
    # materializes as full HBM copies). Internally everything is the
    # stacked form; the unstacked case is L=1 + layer 0 (free reshape).
    if k.ndim == 4:
        k, v = k[None], v[None]
        if k_scale is not None:
            k_scale, v_scale = k_scale[None], v_scale[None]
        layer = jnp.zeros((1,), jnp.int32)
    L, _, KH, Sk = k.shape[0], k.shape[1], k.shape[2], k.shape[3]
    group = H // KH
    quant = k_scale is not None

    dhp = _round_up(dh, LANE)
    tk = min(tk, _round_up(Sk, LANE))
    sk = _round_up(Sk, tk)
    if causal:
        # pick the query tile so tiles never straddle a head boundary
        # partially: small per-head row counts fold the WHOLE group into
        # one tile; large ones tile within a head. Each head's rows are
        # padded to sq so the kernel's r % sq row->position map holds.
        sq = _round_up(S, 16)
        if group * sq <= tq:
            tq = group * sq
        else:
            tq = min(tq, sq)
            sq = _round_up(S, tq)
        rq = group * sq
        if dhp != dh or sq != S:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, sq - S), (0, dhp - dh)))
        # GQA fold: [B, H, sq, dhp] -> [B, KH, g*sq, dhp] — heads h in
        # [kh*g, (kh+1)*g) are consecutive (models/decoder.py _split_qkv),
        # so a plain reshape groups each KV head's queries contiguously
        q = q.reshape(B, KH, rq, dhp)
    else:
        # COMPACT fold (mask-only visibility => rows are independent
        # queries with no positional identity): [B, H, S, dh] ->
        # [B, KH, g*S, dhp], padding the FOLDED row axis once at the end
        # instead of every head's rows to a 16-multiple. At decode (S=1,
        # g=7) the kernel sees 16 rows instead of 112 — 7x less VPU
        # exp/softmax work per KV tile, which was most of the 52-61%-of-
        # KV-floor gap in the B=8/32 long-context serving regimes.
        sq = S  # only consumed by the causal row->position math
        rq_real = group * S
        if dhp != dh:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, dhp - dh)))
        q = q.reshape(B, KH, rq_real, dhp)
        rq = _round_up(rq_real, 16)
        if rq <= tq:
            tq = rq
        else:
            tq = min(tq, rq)           # caller tiles are 16-multiples
            rq = _round_up(rq_real, tq)
        if rq != rq_real:
            q = jnp.pad(q, ((0, 0), (0, 0), (0, rq - rq_real), (0, 0)))
    if dhp != dh or sk != Sk:
        # NOTE: this pad copies the whole (stacked) cache — serving caches
        # are allocated at tile-multiple C and 128-multiple dh so it never
        # fires there
        pad5 = ((0, 0), (0, 0), (0, 0), (0, sk - Sk), (0, dhp - dh))
        k, v = jnp.pad(k, pad5), jnp.pad(v, pad5)
    # merge [L, B, ...] -> [L*B, ...]: a free reshape that lets one set of
    # 4-d BlockSpecs serve both forms (row li*B + b)
    k = k.reshape(L * B, KH, sk, dhp)
    v = v.reshape(L * B, KH, sk, dhp)
    # [B, 1, sk]: the unit sublane axis equals the full array dim, which is
    # what Mosaic's block-tiling rule requires of a (1, 1, tk) block
    mask = jnp.pad(key_mask.astype(jnp.float32),
                   ((0, 0), (0, sk - Sk)))[:, None, :]

    if not causal:
        # merge KV heads into the visit: the compact-fold q tile is tiny,
        # so per-visit fixed costs (~0.4 us dispatch/semaphore) rival the
        # DMA at int8 byte rates. nh heads per block = nh-x fewer visits
        # at the same total bytes; cap so the double-buffered K+V blocks
        # stay within ~8 MB of VMEM.
        per_head = tk * dhp * (k.dtype.itemsize + v.dtype.itemsize)
        nh = 1
        for cand in range(KH, 0, -1):
            if KH % cand == 0 and cand * per_head * 2 <= 8 * 2 ** 20:
                nh = cand
                break
    else:
        nh = 1
    if not causal:
        fresh = fresh_k is not None
        if fresh and ml:
            raise ValueError("fresh-column fold replaces the (m, l) path")
        grid = (B, KH // nh, rq // tq, sk // tk)
        kern = functools.partial(_flash_cached_kernel, scale=scale, nh=nh,
                                 tq=tq, tk=tk, quant=quant, ml=ml,
                                 fresh=fresh)
        in_specs = [
            pl.BlockSpec((1, nh, tq, dhp),
                         lambda b, kg, i, j, *refs: (b, kg, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, tk, dhp),
                         lambda b, kg, i, j, off, li, *r, B=B:
                         (li[0] * B + b, kg, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh, tk, dhp),
                         lambda b, kg, i, j, off, li, *r, B=B:
                         (li[0] * B + b, kg, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk), lambda b, kg, i, j, *refs: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ]
        operands = [q, k, v, mask]
        if quant:
            for s_ in (k_scale, v_scale):
                sp = jnp.pad(s_.astype(jnp.float32),
                             ((0, 0), (0, 0), (0, 0), (0, sk - Sk)))
                operands.append(sp.reshape(L * B, KH, 1, sk))
                in_specs.append(pl.BlockSpec(
                    (1, nh, 1, tk),
                    lambda b, kg, i, j, off, li, *r, B=B:
                    (li[0] * B + b, kg, 0, j),
                    memory_space=pltpu.VMEM))
        if fresh:
            for t in (fresh_k, fresh_v):             # [B, KH, 1, dh] bf16
                if dhp != dh:
                    t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, dhp - dh)))
                operands.append(t.astype(q.dtype))
                in_specs.append(pl.BlockSpec(
                    (1, nh, 1, dhp),
                    lambda b, kg, i, j, *refs: (b, kg, 0, 0),
                    memory_space=pltpu.VMEM))
        o_block = pl.BlockSpec((1, nh, tq, dhp),
                               lambda b, kg, i, j, *refs: (b, kg, i, 0),
                               memory_space=pltpu.VMEM)
        out_specs = o_block
        out_shape = jax.ShapeDtypeStruct((B, KH, rq, dhp), q.dtype)
        if ml:
            ml_block = pl.BlockSpec((1, nh, tq, LANE),
                                    lambda b, kg, i, j, *refs:
                                    (b, kg, i, 0),
                                    memory_space=pltpu.VMEM)
            out_specs = [o_block, ml_block, ml_block]
            out_shape = [
                out_shape,
                jax.ShapeDtypeStruct((B, KH, rq, LANE), jnp.float32),
                jax.ShapeDtypeStruct((B, KH, rq, LANE), jnp.float32)]
        scratch = [
            pltpu.VMEM((nh * tq, dhp), jnp.float32),   # ctx accumulator
            pltpu.VMEM((nh * tq, LANE), jnp.float32),  # running max
            pltpu.VMEM((nh * tq, LANE), jnp.float32),  # running denominator
        ]
    else:
        grid = (B, KH, rq // tq, sk // tk)
        kern = functools.partial(_flash_kernel, scale=scale, causal=causal,
                                 tq=tq, tk=tk, sq=sq, quant=quant, ml=ml)
        in_specs = [
            pl.BlockSpec((1, 1, tq, dhp),
                         lambda b, kh, i, j, off, li: (b, kh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, dhp),
                         lambda b, kh, i, j, off, li, B=B: (li[0] * B + b,
                                                            kh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, dhp),
                         lambda b, kh, i, j, off, li, B=B: (li[0] * B + b,
                                                            kh, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk), lambda b, kh, i, j, off, li: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ]
        operands = [q, k, v, mask]
        if quant:
            # per-column KV scales [L, B, KH, Sk] f32 -> [L*B, KH, 1, sk]
            # (the unit sublane dim keeps the (1, 1, 1, tk) block Mosaic-
            # legal, same trick as the mask). Padded columns scale to 0 —
            # mask-dead anyway
            for s_ in (k_scale, v_scale):
                sp = jnp.pad(s_.astype(jnp.float32),
                             ((0, 0), (0, 0), (0, 0), (0, sk - Sk)))
                operands.append(sp.reshape(L * B, KH, 1, sk))
                in_specs.append(pl.BlockSpec(
                    (1, 1, 1, tk),
                    lambda b, kh, i, j, off, li, B=B: (li[0] * B + b,
                                                       kh, 0, j),
                    memory_space=pltpu.VMEM))
        o_block = pl.BlockSpec((1, 1, tq, dhp),
                               lambda b, kh, i, j, off, li: (b, kh, i, 0),
                               memory_space=pltpu.VMEM)
        out_specs = o_block
        out_shape = jax.ShapeDtypeStruct((B, KH, rq, dhp), q.dtype)
        if ml:
            # un-normalized (m, l) flash state — lane-broadcast f32, so
            # callers can fold extra softmax columns in without a kernel
            # re-entry
            ml_block = pl.BlockSpec((1, 1, tq, LANE),
                                    lambda b, kh, i, j, off, li:
                                    (b, kh, i, 0),
                                    memory_space=pltpu.VMEM)
            out_specs = [o_block, ml_block, ml_block]
            out_shape = [
                out_shape,
                jax.ShapeDtypeStruct((B, KH, rq, LANE), jnp.float32),
                jax.ShapeDtypeStruct((B, KH, rq, LANE), jnp.float32)]
        scratch = [
            pltpu.VMEM((tq, dhp), jnp.float32),    # ctx accumulator
            pltpu.VMEM((tq, LANE), jnp.float32),   # running max (lane-bcast)
            pltpu.VMEM((tq, LANE), jnp.float32),   # running denominator
        ]
    fresh_call = (not causal) and fresh_k is not None
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if fresh_call else 2,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * KH * rq * sk * dhp,
            bytes_accessed=(q.size * q.dtype.itemsize
                            + 2 * B * KH * sk * dhp * k.dtype.itemsize)
            + B * KH * rq * dhp * q.dtype.itemsize,
            transcendentals=B * KH * rq * sk,
        ),
        interpret=interpret,
    )(q_offset.astype(jnp.int32),
      jnp.asarray(layer, jnp.int32).reshape(1),
      *([jnp.asarray(fresh_gate, jnp.float32).reshape(-1)]
        if fresh_call else []),
      *operands)
    if causal:
        if ml:
            o, m, l = out
            return (o.reshape(B, H, sq, dhp)[:, :, :S, :dh],
                    m.reshape(B, H, sq, LANE)[:, :, :S, 0],
                    l.reshape(B, H, sq, LANE)[:, :, :S, 0])
        return out.reshape(B, H, sq, dhp)[:, :, :S, :dh]
    # compact-fold unfold: real rows are the first g*S of each KV head
    gs = group * S
    if ml:
        o, m, l = out
        return (o[:, :, :gs].reshape(B, H, S, dhp)[..., :dh],
                m[:, :, :gs, 0].reshape(B, H, S),
                l[:, :, :gs, 0].reshape(B, H, S))
    return out[:, :, :gs].reshape(B, H, S, dhp)[..., :dh]


def _flash_dq_kernel(q_ref, k_ref, v_ref, do_ref, maskt_ref, d_ref,
                     dq_ref, lse_ref, acc_ref, m_ref, l_ref, *,
                     scale, causal, tq, tk, sq):
    """dQ pass + logsumexp, KV-minor. Everything is computed in the
    TRANSPOSED orientation ``s_t = K @ Q^T`` [tk, tq]: query rows live on
    the LANE axis, so the per-row running max/denominator/D broadcast as
    ``[1, tq]`` lane vectors — no sublane<->lane transposes anywhere. The
    dQ accumulator is [dhp, tq] for the same reason (the online-softmax
    rescale multiplies per QUERY, i.e. per lane); the caller transposes
    the assembled [B, KH, dhp, rq] result once with XLA. Key validity
    must therefore sit on the SUBLANE axis — ``maskt_ref`` is the
    lane-broadcast [sk, LANE] transposed mask."""
    i = pl.program_id(2)
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_BIG)
        l_ref[:] = jnp.zeros_like(l_ref)

    def _tile():
        q = q_ref[0, 0]                                   # [tq, dhp]
        k = k_ref[0, 0]                                   # [tk, dhp]
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [tk, tq]
        vis = maskt_ref[0][:, :1] > 0.0                   # [tk, 1]
        if causal:
            kcol = j * tk + jax.lax.broadcasted_iota(jnp.int32, (tk, tq), 0)
            qrow = (i * tq + jax.lax.broadcasted_iota(
                jnp.int32, (tk, tq), 1)) % sq
            vis = vis & (kcol <= qrow)
        st = st + (vis.astype(jnp.float32) - 1.0) * 1e9   # forward's bias

        m_old = m_ref[:1]                                 # [1, tq]
        m_new = jnp.maximum(m_old, jnp.max(st, axis=0, keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.exp(st - m_new)                           # [tk, tq] unnorm.
        l_ref[:1] = l_ref[:1] * corr + jnp.sum(p, axis=0, keepdims=True)
        dp = jax.lax.dot_general(
            v_ref[0, 0], do_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [tk, tq]
        # dS = P (dP - D) * scale; P normalized — the 1/l and the running-max
        # drift are linear in P, so accumulate unnormalized with the same
        # corr rescale as the forward and divide by l once at the end
        ds = (p * (dp - d_ref[0]) * scale).astype(k.dtype)
        dqc = jax.lax.dot_general(
            k, ds, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [dhp, tq]
        acc_ref[:] = acc_ref[:] * corr + dqc
        m_ref[:1] = m_new

    if causal:
        mx = sq - 1 if tq >= sq else (i * tq) % sq + tq - 1
        @pl.when(j * tk <= mx)
        def _():
            _tile()
    else:
        _tile()

    @pl.when(j == nk - 1)
    def _finish():
        dq_ref[0, 0] = (acc_ref[:] / l_ref[:1]).astype(dq_ref.dtype)
        # rows with zero visible keys have l ~ count * exp(0) (the -1e9 bias
        # keeps m finite), so lse is finite garbage — their dO is 0 upstream
        lse_ref[0] = m_ref[:1] + jnp.log(l_ref[:1])


def _flash_dkv_kernel(q_ref, k_ref, v_ref, do_ref, maskt_ref, lse_ref, d_ref,
                      dk_ref, dv_ref, dk_acc, dv_acc, *,
                      scale, causal, tq, tk, sq):
    """dK/dV pass, Q-minor: for a fixed KV tile the [tk, dhp] accumulators
    stay resident while the (GQA-folded) query tiles stream — the fold sums
    each KV head's gradient over its whole query group for free. Same
    transposed orientation as the dQ pass; P is reconstructed exactly from
    the dQ pass's logsumexp (softmax(s) == exp(s - lse))."""
    j = pl.program_id(2)
    i = pl.program_id(3)
    ni = pl.num_programs(3)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    def _tile():
        q = q_ref[0, 0]                                   # [tq, dhp]
        k = k_ref[0, 0]                                   # [tk, dhp]
        do = do_ref[0, 0]                                 # [tq, dhp]
        st = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [tk, tq]
        vis = maskt_ref[0][:, :1] > 0.0
        if causal:
            kcol = j * tk + jax.lax.broadcasted_iota(jnp.int32, (tk, tq), 0)
            qrow = (i * tq + jax.lax.broadcasted_iota(
                jnp.int32, (tk, tq), 1)) % sq
            vis = vis & (kcol <= qrow)
        st = st + (vis.astype(jnp.float32) - 1.0) * 1e9
        p = jnp.exp(st - lse_ref[0])                      # [tk, tq], normed
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [tk, dhp]
        dp = jax.lax.dot_general(
            v_ref[0, 0], do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [tk, tq]
        ds = (p * (dp - d_ref[0]) * scale).astype(q.dtype)
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [tk, dhp]

    if causal:
        # q tiles whose every row sits left of this KV tile see nothing
        mx = sq - 1 if tq >= sq else (i * tq) % sq + tq - 1
        @pl.when(j * tk <= mx)
        def _():
            _tile()
    else:
        _tile()

    @pl.when(i == ni - 1)
    def _finish():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "tq", "tk", "interpret"))
def _flash_bwd_call(q, k, v, key_mask, out, g, *, scale, causal, tq, tk,
                    interpret):
    """Flash backward: (dq, dk, dv) without materializing ``[S, S]``.

    Two Pallas passes over the same GQA-folded layout as the forward:
    a KV-minor dQ pass that also produces the logsumexp, and a Q-minor
    dK/dV pass that reconstructs P from it. D = rowsum(dO * O) is one
    cheap XLA reduction over tensors the VJP already holds."""
    B, H, S, dh = q.shape
    KH, Sk = k.shape[1], k.shape[2]
    group = H // KH

    dhp = _round_up(dh, LANE)
    tk = min(tk, _round_up(Sk, LANE))
    sk = _round_up(Sk, tk)
    sq = _round_up(S, 16)
    if group * sq <= tq:
        tq = group * sq
    else:
        tq = min(tq, sq)
        sq = _round_up(S, tq)
    rq = group * sq

    D = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    if sq != S:
        D = jnp.pad(D, ((0, 0), (0, 0), (0, sq - S)))
    D = D.reshape(B * KH, 1, rq)
    if dhp != dh or sq != S:
        pad4 = ((0, 0), (0, 0), (0, sq - S), (0, dhp - dh))
        q, g = jnp.pad(q, pad4), jnp.pad(g, pad4)
    q = q.reshape(B, KH, rq, dhp)
    do = g.reshape(B, KH, rq, dhp)
    if dhp != dh or sk != Sk:
        pad4 = ((0, 0), (0, 0), (0, sk - Sk), (0, dhp - dh))
        k, v = jnp.pad(k, pad4), jnp.pad(v, pad4)
    # key validity on the SUBLANE axis (see _flash_dq_kernel): [B, sk, LANE]
    maskt = jnp.broadcast_to(
        jnp.pad(key_mask.astype(jnp.float32),
                ((0, 0), (0, sk - Sk)))[:, :, None], (B, sk, LANE))

    q_spec = pl.BlockSpec((1, 1, tq, dhp),
                          lambda b, kh, x, y: (b, kh, x, 0))
    q_spec_min = pl.BlockSpec((1, 1, tq, dhp),
                              lambda b, kh, x, y: (b, kh, y, 0))
    k_spec = pl.BlockSpec((1, 1, tk, dhp),
                          lambda b, kh, x, y: (b, kh, y, 0))
    k_spec_maj = pl.BlockSpec((1, 1, tk, dhp),
                              lambda b, kh, x, y: (b, kh, x, 0))
    mt_spec = pl.BlockSpec((1, tk, LANE), lambda b, kh, x, y: (b, y, 0))
    mt_spec_maj = pl.BlockSpec((1, tk, LANE), lambda b, kh, x, y: (b, x, 0))
    row_spec = pl.BlockSpec(
        (1, 1, tq), lambda b, kh, x, y, KH=KH: (b * KH + kh, 0, x))
    row_spec_min = pl.BlockSpec(
        (1, 1, tq), lambda b, kh, x, y, KH=KH: (b * KH + kh, 0, y))

    dq_t, lse = pl.pallas_call(
        functools.partial(_flash_dq_kernel, scale=scale, causal=causal,
                          tq=tq, tk=tk, sq=sq),
        grid=(B, KH, rq // tq, sk // tk),
        in_specs=[q_spec, k_spec, k_spec, q_spec, mt_spec, row_spec],
        out_specs=[
            pl.BlockSpec((1, 1, dhp, tq), lambda b, kh, x, y: (b, kh, 0, x)),
            row_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, KH, dhp, rq), q.dtype),
            jax.ShapeDtypeStruct((B * KH, 1, rq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((dhp, tq), jnp.float32),   # dq accumulator
            pltpu.VMEM((8, tq), jnp.float32),     # running max (row 0)
            pltpu.VMEM((8, tq), jnp.float32),     # running denominator
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * sq * sk * dhp,
            bytes_accessed=2 * (q.size + 2 * k.size) * q.dtype.itemsize,
            transcendentals=B * H * sq * sk,
        ),
        interpret=interpret,
    )(q, k, v, do, maskt, D)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, scale=scale, causal=causal,
                          tq=tq, tk=tk, sq=sq),
        grid=(B, KH, sk // tk, rq // tq),
        in_specs=[q_spec_min, k_spec_maj, k_spec_maj, q_spec_min,
                  mt_spec_maj, row_spec_min, row_spec_min],
        out_specs=[
            pl.BlockSpec((1, 1, tk, dhp), lambda b, kh, x, y: (b, kh, x, 0)),
            pl.BlockSpec((1, 1, tk, dhp), lambda b, kh, x, y: (b, kh, x, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, KH, sk, dhp), k.dtype),
            jax.ShapeDtypeStruct((B, KH, sk, dhp), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk, dhp), jnp.float32),   # dk accumulator
            pltpu.VMEM((tk, dhp), jnp.float32),   # dv accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * sq * sk * dhp,
            bytes_accessed=2 * (q.size + 2 * k.size) * q.dtype.itemsize,
            transcendentals=B * H * sq * sk,
        ),
        interpret=interpret,
    )(q, k, v, do, maskt, lse, D)

    dq = dq_t.transpose(0, 1, 3, 2).reshape(B, H, sq, dhp)[:, :, :S, :dh]
    return dq, dk[:, :, :Sk, :dh], dv[:, :, :Sk, :dh]


def mha_reference(q, k, v, key_mask, scale, causal=True):
    """Einsum oracle — the exact op sequence of models/decoder.py:_attend
    with the prefill bias, in f32. Also the recompute target of the VJP."""
    g = q.shape[1] // k.shape[1]
    if g > 1:
        k, v = jnp.repeat(k, g, axis=1), jnp.repeat(v, g, axis=1)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    vis = key_mask.astype(jnp.float32)[:, None, None, :]
    if causal:
        S = q.shape[2]
        vis = vis * jnp.tril(jnp.ones((S, S), jnp.float32))[None, None]
    logits = logits + (vis - 1.0) * 1e9
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_mha(q, k, v, key_mask, scale, causal):
    interpret = not _on_tpu()
    return _flash_call(q, k, v, key_mask, jnp.zeros((q.shape[0],), jnp.int32),
                       scale=scale, causal=causal,
                       tq=256, tk=1024, interpret=interpret)


def _flash_mha_fwd(q, k, v, key_mask, scale, causal):
    out = _flash_mha(q, k, v, key_mask, scale, causal)
    # name the output residual: under jax.checkpoint with
    # save_only_these_names("flash_out", ...) the backward reads the saved
    # buffer instead of replaying the whole Pallas forward kernel to
    # regenerate it (models/decoder.py remat="names")
    from jax.ad_checkpoint import checkpoint_name
    return out, (q, k, v, key_mask, checkpoint_name(out, "flash_out"))


def _flash_mha_bwd(scale, causal, res, g):
    q, k, v, key_mask, out = res
    dq, dk, dv = _flash_bwd_call(q, k, v, key_mask, out, g, scale=scale,
                                 causal=causal, tq=256, tk=512,
                                 interpret=not _on_tpu())
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), \
        jnp.zeros_like(key_mask)


_flash_mha.defvjp(_flash_mha_fwd, _flash_mha_bwd)


def flash_attention(
    q: jax.Array,            # [B, H, S, dh]
    k: jax.Array,            # [B, KH, S, dh] — KH divides H (GQA)
    v: jax.Array,            # [B, KH, S, dh]
    key_mask: jax.Array,     # [B, S], 1.0 = real token
    *,
    scale: float | None = None,
    causal: bool = True,
) -> jax.Array:
    """Masked (causal) attention without materializing ``[S, S]``.

    Query position ``r`` attends to key positions ``c`` with
    ``key_mask[b, c] == 1`` and (if ``causal``) ``c <= r`` — exactly the
    prefill/apply visibility of models/decoder.py. Returns
    ``[B, H, S, dh]`` in q's dtype (callers cast to the activation dtype).
    Differentiable: the VJP is the Pallas flash backward
    (:func:`_flash_bwd_call`) — no ``[S, S]`` in either direction.
    """
    if q.shape[1] % k.shape[1]:
        raise ValueError(f"heads {q.shape[1]} % kv_heads {k.shape[1]} != 0")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_mha(q, k, v, key_mask, float(scale), causal)


def _check_cache_scale_ndim(k_scale, v_scale, *, stacked: bool) -> None:
    """int8-cache scales must match the cache's stacking: a stacked
    [L, B, KH, C, dh] cache needs [L, B, KH, C] scales, an unstacked one
    [B, KH, C] — catch the mismatch here with a clear error instead of an
    opaque pallas_call shape failure deep in _flash_call."""
    if k_scale is None:
        return
    want = 4 if stacked else 3
    shape_txt = "[L, B, KH, C]" if stacked else "[B, KH, C]"
    if k_scale.ndim != want or v_scale.ndim != want:
        raise ValueError(
            f"{'stacked' if stacked else 'unstacked'} cache needs "
            f"{shape_txt} scales, got k_scale.ndim={k_scale.ndim} "
            f"v_scale.ndim={v_scale.ndim}")


def flash_attention_at(
    q: jax.Array,            # [B, H, S, dh] — a fresh suffix of S tokens
    k: jax.Array,            # [B, KH, C, dh] — the full cache (fresh K/V
    v: jax.Array,            #   already scattered at cols col0..col0+S-1)
    key_mask: jax.Array,     # [B, C] — cache validity incl. fresh columns
    col0: jax.Array,         # [B] i32 — cache column of each lane's query 0
    *,
    scale: float | None = None,
    k_scale: jax.Array | None = None,   # [B, KH, C] — int8 cache scales
    v_scale: jax.Array | None = None,
    layer: jax.Array | None = None,     # i32 — with a STACKED [L, B, KH,
                                        # C, dh] cache, the layer to read
) -> jax.Array:
    """Continuation attention: query ``r`` sees cache columns
    ``c <= col0[b] + r`` that are mask-live — the visibility of
    ``Decoder.prefill_extend`` (chunked prefill / prefix-cache suffix) —
    without materializing the ``[S, C]`` logits. With ``k_scale``/
    ``v_scale`` the cache holds int8 codes (kv_dtype="int8"): codes stream
    at 1 byte/elt and the per-column scales fold into logits / softmax
    weights in-kernel, same math as the einsum int8 branch. With ``layer``
    the cache is the whole stacked [L, ...] tree and the index selects the
    layer's tiles via scalar prefetch (zero-copy — the decoder's layer
    loop never slices the cache). Serving-only: NOT differentiable
    (prefill_extend never trains). Returns ``[B, H, S, dh]`` in q's
    dtype."""
    if (layer is not None) != (k.ndim == 5):
        raise ValueError("stacked [L, B, KH, C, dh] cache iff layer given")
    kh_ax = 2 if layer is not None else 1
    if q.shape[1] % k.shape[kh_ax]:
        raise ValueError(
            f"heads {q.shape[1]} % kv_heads {k.shape[kh_ax]} != 0")
    if (k_scale is None) != (v_scale is None):
        raise ValueError("k_scale and v_scale must be given together")
    _check_cache_scale_ndim(k_scale, v_scale, stacked=layer is not None)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_call(q, k, v, key_mask, col0, layer,
                       k_scale=k_scale, v_scale=v_scale,
                       scale=float(scale), causal=True, tq=256, tk=2048,
                       interpret=not _on_tpu())


def flash_attention_cached(
    q: jax.Array,            # [B, H, S, dh] — decode-step queries (S small)
    k: jax.Array,            # [B, KH, C, dh] — the full cache
    v: jax.Array,            # [B, KH, C, dh]
    key_mask: jax.Array,     # [B, C] — 1.0 = live cache column
    *,
    scale: float | None = None,
    k_scale: jax.Array | None = None,   # [B, KH, C] — int8 cache scales
    v_scale: jax.Array | None = None,
    layer: jax.Array | None = None,     # i32 — with a STACKED [L, B, KH,
                                        # C, dh] cache, the layer to read
    return_ml: bool = False,            # also return the un-normalized
                                        # flash state (m, l) [B, H, S] f32
    fresh_k: jax.Array | None = None,   # [B, KH, 1, dh] float — the
                                        # decode step's fresh K column,
                                        # folded into the softmax
                                        # IN-kernel (replaces the
                                        # return_ml + outside-combine
                                        # pattern: no m/l traffic, no
                                        # post-kernel fusions)
    fresh_v: jax.Array | None = None,   # [B, KH, 1, dh] float
    fresh_gate: jax.Array | None = None,  # [B] f32, 1 = lane active
    tk: int | None = None,              # KV tile; None = min(C, 4096) —
                                        # tk == C keeps each merged-head
                                        # block DMA fully contiguous
                                        # (benchmarks/attn_cached.py: the
                                        # strided tk<C blocks cost ~20% at
                                        # bf16; 4096 caps the double-
                                        # buffered block VMEM at ~8 MB)
) -> jax.Array:
    """Mask-only cache attention — ``Decoder.decode_step``/
    ``decode_step_slots`` visibility (the key mask alone encodes what each
    lane may see; no causal term). The payoff vs the einsum path is the
    GQA fold: the cache is read at KH heads instead of being
    ``jnp.repeat``-expanded to H — at 7B GQA 28q/4kv and C=4096 that is
    ~6.4 GB of avoided HBM traffic per decode step. With ``k_scale``/
    ``v_scale`` the cache holds int8 codes (kv_dtype="int8"): codes stream
    at 1 byte/elt and the scales fold in-kernel — the einsum int8 branch's
    math without its g-fold repeat of codes AND scales. With ``layer`` the
    cache is the whole stacked [L, ...] tree, read zero-copy via scalar
    prefetch. Serving-only, not differentiable. Returns ``[B, H, S, dh]``
    in q's dtype."""
    if (layer is not None) != (k.ndim == 5):
        raise ValueError("stacked [L, B, KH, C, dh] cache iff layer given")
    kh_ax = 2 if layer is not None else 1
    if q.shape[1] % k.shape[kh_ax]:
        raise ValueError(
            f"heads {q.shape[1]} % kv_heads {k.shape[kh_ax]} != 0")
    if (k_scale is None) != (v_scale is None):
        raise ValueError("k_scale and v_scale must be given together")
    _check_cache_scale_ndim(k_scale, v_scale, stacked=layer is not None)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if tk is None:
        tk = min(_round_up(k.shape[3 if layer is not None else 2], LANE),
                 4096)
    if (fresh_k is None) != (fresh_v is None):
        raise ValueError("fresh_k and fresh_v must be given together")
    if fresh_k is not None and fresh_gate is None:
        fresh_gate = jnp.ones((q.shape[0],), jnp.float32)
    return _flash_call(q, k, v, key_mask,
                       jnp.zeros((q.shape[0],), jnp.int32), layer,
                       k_scale=k_scale, v_scale=v_scale,
                       fresh_k=fresh_k, fresh_v=fresh_v,
                       fresh_gate=fresh_gate,
                       scale=float(scale), causal=False, tq=256, tk=tk,
                       interpret=not _on_tpu(), ml=return_ml)
