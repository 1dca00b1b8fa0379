"""10M x 768 exact search on a single v5e chip (BASELINE config 5 scale).

The config-5 target assumed 10M vectors need a v5e-8 slice; int8 storage
(7.7 GB + 40 MB scales) fits the whole corpus in ONE chip's HBM, and
--dtype int4 (row-pair packed, 3.9 GB at 10M) doubles that headroom —
20M+ vectors per chip. The corpus is generated, normalized, and quantized
on-device in chunks into a donated buffer (materializing 10M x 768 f32 =
30 GB is impossible), then the fused kernel scans it.

Correctness proxy at this scale (no f32 oracle fits): queries are noisy
copies of known rows; we report the planted-row hit rate in the top-k
(recall@1-of-10 of the true neighbor).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=500_000)
    ap.add_argument("--ivf-chunk", type=int, default=62_500)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--skip-ivf", action="store_true")
    ap.add_argument("--dtype", choices=("int8", "int4"), default="int8")
    args = ap.parse_args()
    n, d, b, k, ch = args.n, args.d, args.b, args.k, args.chunk
    assert n % ch == 0

    import jax
    import jax.numpy as jnp

    from mediquery_rag_tpu.obs.metrics import device_time
    from mediquery_rag_tpu.ops.quant import (
        int4_flat_search, int8_flat_search, quantize_rows, quantize_rows_int4,
    )

    int4 = args.dtype == "int4"
    TC = 6144 if int4 else 2048
    n_pad = -(-n // TC) * TC
    flat_search_q = int4_flat_search if int4 else int8_flat_search

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill_chunk(buf, scales, seed, start):
        x = jax.random.normal(jax.random.PRNGKey(seed), (ch, d), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        if int4:
            qq, sc = quantize_rows_int4(x)       # [ch/2, d], planes [2, ch/2]
            buf = jax.lax.dynamic_update_slice(buf, qq, (start // 2, 0))
            scales = jax.lax.dynamic_update_slice(scales, sc, (0, start // 2))
        else:
            qq, sc = quantize_rows(x)
            buf = jax.lax.dynamic_update_slice(buf, qq, (start, 0))
            scales = jax.lax.dynamic_update_slice(scales, sc, (start,))
        return buf, scales

    t0 = time.perf_counter()
    if int4:
        buf = jnp.zeros((n_pad // 2, d), jnp.int8)
        scales = jnp.zeros((2, n_pad // 2), jnp.float32)
    else:
        buf = jnp.zeros((n_pad, d), jnp.int8)
        scales = jnp.zeros((n_pad,), jnp.float32)
    for i in range(n // ch):
        buf, scales = fill_chunk(buf, scales, i, i * ch)
    jax.block_until_ready(buf)
    t_build = time.perf_counter() - t0
    print(json.dumps({"stage": "build", "n": n, "d": d,
                      "seconds": round(t_build, 2),
                      "hbm_gb": round(buf.nbytes / 1e9, 2)}))

    # queries: noisy copies of known rows (regenerate those rows' chunks)
    rng = np.random.default_rng(0)
    target_rows = rng.integers(0, n, b)
    q_list = []
    for r in target_rows:
        seed, off = int(r // ch), int(r % ch)
        row = jax.random.normal(jax.random.PRNGKey(seed), (ch, d))[off]
        row = row / jnp.linalg.norm(row)
        q_list.append(np.asarray(row))
    q = np.stack(q_list) + 0.02 * rng.standard_normal((b, d)).astype(np.float32)
    q = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True), jnp.float32)

    s, i = flat_search_q(q, buf, scales, k, n_valid=n, corpus_tile=TC)
    hits = float(np.mean([int(target_rows[r]) in np.asarray(i[r]).tolist()
                          for r in range(b)]))

    iters = 8
    qs = jnp.stack([q + 0.0005 * t for t in range(iters)])
    t = device_time(
        lambda qb, corp, sc: flat_search_q(qb, corp, sc, k, n_valid=n,
                                           corpus_tile=TC),
        qs, buf, scales)
    # int4 scale planes are [2, n_pad/2] f32 = 4 bytes per LOGICAL row
    floor_bytes = (d // 2 + 4) if int4 else (d + 4)
    print(json.dumps({
        "stage": "search", "engine": f"flat_{args.dtype}_single_chip",
        "n": n, "d": d, "batch": b, "k": k,
        "ms_per_batch": round(t * 1e3, 3),
        "qps": round(b / t, 1),
        "planted_neighbor_hit_rate": hits,
        "hbm_floor_ms": round(n_pad * floor_bytes / 819e9 * 1e3, 3),
    }), flush=True)

    if args.skip_ivf:
        return
    del buf, scales, s, i           # free HBM for the IVF bucket array

    # ---- 10M IVF on ONE chip via the streaming builder ---------------------
    # The f32 corpus (30 GB) never exists on device: chunks are regenerated,
    # assigned, and scattered into the pre-allocated int8 bucket buffer.
    from mediquery_rag_tpu.config import EngineConfig
    from mediquery_rag_tpu.engine import IVFIndex
    from mediquery_rag_tpu.engine.ivf import _ivf_dispatch

    rows = args.ivf_chunk
    assert n % rows == 0

    def make_chunks():
        for s_ in range(n // rows):
            yield jax.random.normal(jax.random.PRNGKey(10_000 + s_),
                                    (rows, d), jnp.float32)

    cfg = EngineConfig(dim=d, dtype=args.dtype, ivf_nlist=args.nlist,
                       ivf_kmeans_iters=8, ivf_cap_factor=1.25,
                       ivf_balance=0.05)
    t0 = time.perf_counter()
    iv = IVFIndex.build_streaming(make_chunks, n, cfg, chunk_rows=rows,
                                  transfer_dtype="bfloat16")
    t_build = time.perf_counter() - t0
    print(json.dumps({
        "stage": "ivf_build_streaming", "n": n, "nlist": args.nlist,
        "cap": iv.cap, "seconds": round(t_build, 1),
        "hbm_gb": round(iv.nbytes / 1e9, 2)}), flush=True)

    # planted queries against the streamed corpus
    tgt = rng.integers(0, n, b)
    ql = []
    for r in tgt:
        seed, off = int(r // rows), int(r % rows)
        row = jax.random.normal(jax.random.PRNGKey(10_000 + seed),
                                (rows, d))[off]
        ql.append(np.asarray(row / jnp.linalg.norm(row)))
    q2 = np.stack(ql) + 0.02 * rng.standard_normal((b, d)).astype(np.float32)
    q2 = jnp.asarray(q2 / np.linalg.norm(q2, axis=1, keepdims=True))

    for nprobe in (8, 16, 32):
        _, ii = iv.search(q2, k=k, nprobe=nprobe, batched=False)
        hits = float(np.mean([int(tgt[r]) in np.asarray(ii[r]).tolist()
                              for r in range(b)]))
        scales_iv = iv.bucket_scales
        def one(qrow, cents, bk, bids, sc, npb=nprobe):
            return _ivf_dispatch(qrow, cents, bk, bids, sc, k=k, nprobe=npb,
                                 batched=False, quant=args.dtype,
                                 cosine=True)[0]
        t1 = device_time(one, q2[:, None, :], iv.centroids, iv.buckets,
                         iv.bucket_ids, scales_iv)
        print(json.dumps({
            "stage": "ivf_search",
            "engine": f"ivf_{args.dtype}_single_chip_10m",
            "nprobe": nprobe, "batch": 1, "k": k,
            "latency_us": round(t1 * 1e6, 1),
            "qps_single_stream": round(1 / t1, 1),
            "planted_neighbor_hit_rate": hits}), flush=True)


if __name__ == "__main__":
    main()
