"""Recall@10 at 10M on CLUSTERED data vs an exact int8 oracle (BASELINE
config 5: QPS *at recall@10 parity* on 10M x 768).

The r3 10M table reported planted-hit rates on UNIFORM vectors only; the
"0.99+ clustered" claim was measured at 1M. This benchmark substantiates
config-5 at full scale: the same 1024-cluster geometry benchmarks/parity.py
uses (std-normal centers + 0.35-sigma member noise, queries = 0.05-sigma
perturbed corpus rows), 10M rows, one v5e chip, recall@10 of the streaming
IVF against the exact int8 flat scan over the SAME corpus, at nprobe in
{4, 8, 16, 32}, with per-point latency (B=1 query-major) and batched QPS
(B=64 bucket-major).

The corpus never exists in f32 (30 GB): chunks are regenerated on device
from seeds in every pass. Phase plan keeps peak HBM under 16 GB — the
oracle's int8 flat buffer (7.7 GB) is freed before the IVF bucket array
(~9.7 GB at cap_factor 1.25) is allocated; the two phases see bit-identical
rows because generation is keyed by chunk seed only.

Replaces nothing in parity.py (200k, with the C++ HNSW oracle); this is
the at-scale recall curve. Ref: the k=5 search the reference runs through
Chroma/hnswlib (/root/reference/src/agents/nodes.py:93) at corpus sizes
hnswlib handles only with a full CPU host's RAM.
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--chunk", type=int, default=125_000,
                    help="chunk rows for BOTH phases (generation is keyed "
                         "by (start_row, rows), so oracle and IVF must "
                         "chunk identically to see identical rows; 125k "
                         "keeps two live f32 chunks + the 9.7 GB bucket "
                         "array under 16 GB HBM)")
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--noise", type=float, default=0.35)
    ap.add_argument("--qnoise", type=float, default=0.05)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--nprobes", default="4,8,16,32")
    ap.add_argument("--cap-factor", type=float, default=1.5,
                    help="bucket cap vs avg cluster size. On clustered "
                         "data 1.25 caps recall at ~0.91: rows evicted "
                         "from overfull natural clusters land in buckets "
                         "the query never probes. 1.5 = 11.6 GB buckets "
                         "at 10M/4096, still fits after the oracle "
                         "buffer is freed")
    ap.add_argument("--balance", type=float, default=0.1,
                    help="k-means size penalty: evens cluster sizes so "
                         "fewer rows overflow the cap")
    args = ap.parse_args()
    n, d, b, k, ch = args.n, args.d, args.b, args.k, args.chunk
    assert n % ch == 0

    import functools

    import jax
    import jax.numpy as jnp

    from mediquery_rag_tpu.obs.metrics import device_time, recall_at_k
    from mediquery_rag_tpu.ops.quant import int8_flat_search, quantize_rows

    # deterministic clustered geometry (parity.py's, scaled to 10M)
    centers = jax.random.normal(jax.random.PRNGKey(999),
                                (args.clusters, d), jnp.float32)

    def gen_chunk(seed: int, rows: int):
        """Clustered rows [rows, d] f32, L2-normalized, keyed by seed only."""
        kc = jax.random.fold_in(jax.random.PRNGKey(7), seed)
        asg = jax.random.randint(kc, (rows,), 0, args.clusters)
        x = centers[asg] + args.noise * jax.random.normal(
            jax.random.fold_in(kc, 1), (rows, d), jnp.float32)
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    # ---- phase A: exact int8 oracle over the full clustered corpus --------
    TC = 4096
    n_pad = -(-n // TC) * TC

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill(buf, scales, seed, start):
        qq, sc = quantize_rows(gen_chunk(seed, ch))
        buf = jax.lax.dynamic_update_slice(buf, qq, (start, 0))
        scales = jax.lax.dynamic_update_slice(scales, sc, (start,))
        return buf, scales

    t0 = time.perf_counter()
    buf = jnp.zeros((n_pad, d), jnp.int8)
    scales = jnp.zeros((n_pad,), jnp.float32)
    # chunk seed convention: flat chunk i covers rows [i*ch, (i+1)*ch) and
    # is generated from seed i*ch (seeds are row offsets so phase B's
    # different chunk size regenerates identical rows)
    for i in range(n // ch):
        buf, scales = fill(buf, scales, i * ch, i * ch)
    jax.block_until_ready(buf)
    print(json.dumps({"stage": "oracle_build",
                      "seconds": round(time.perf_counter() - t0, 1),
                      "hbm_gb": round(buf.nbytes / 1e9, 2)}), flush=True)

    # queries: perturbed copies of corpus rows (qnoise-sigma, parity.py)
    rng = np.random.default_rng(0)
    target_rows = rng.integers(0, n, b)
    q_list = []
    for r in target_rows:
        base = int(r // ch) * ch
        row = gen_chunk(base, ch)[int(r % ch)]
        q_list.append(np.asarray(row))
    q = np.stack(q_list) + args.qnoise * rng.standard_normal(
        (b, d)).astype(np.float32)
    q = jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))

    _, i_oracle = int8_flat_search(q, buf, scales, k, n_valid=n,
                                   corpus_tile=TC)
    i_oracle = np.asarray(i_oracle)
    planted = float(np.mean([int(target_rows[r]) in i_oracle[r].tolist()
                             for r in range(b)]))
    iters = 8
    qs = jnp.stack([q + 0.0005 * t for t in range(iters)])
    t_flat = device_time(
        lambda qb, corp, sc: int8_flat_search(qb, corp, sc, k, n_valid=n,
                                              corpus_tile=TC),
        qs, buf, scales)
    print(json.dumps({"stage": "oracle_search",
                      "engine": "flat_int8_exact_10m_clustered",
                      "ms_per_batch": round(t_flat * 1e3, 3),
                      "qps": round(b / t_flat, 1),
                      "planted_hit_in_top10": planted}), flush=True)
    del buf, scales

    # ---- phase B: streaming IVF over the SAME rows ------------------------
    from mediquery_rag_tpu.config import EngineConfig
    from mediquery_rag_tpu.engine import IVFIndex
    from mediquery_rag_tpu.engine.ivf import _ivf_dispatch

    rows = ch

    def make_chunks():
        for s in range(n // rows):
            yield gen_chunk(s * rows, rows)

    def sample_rows(idx):
        """Random-access sample fetch (r5): regenerate each chunk ON
        DEVICE inside one jitted scan and gather only its sampled rows —
        the r4 sample pass generated all 160 chunks and pulled 800 MB
        through the relay to keep 2.6% of rows. Chunks with one fewer
        sample than the max repeat their last index (duplicate k-means
        sample rows are harmless)."""
        idx = np.asarray(idx)
        n_chunks = n // rows
        per = [idx[(idx >= s * rows) & (idx < (s + 1) * rows)] - s * rows
               for s in range(n_chunks)]
        cnt = max(max(p.size for p in per), 1)
        local = np.zeros((n_chunks, cnt), np.int32)
        for s, li in enumerate(per):
            if li.size == 0:
                li = np.asarray([0])
            local[s] = np.pad(li, (0, cnt - li.size), mode="edge")

        @jax.jit
        def fetch(local_idx):
            def per_chunk(_, inp):
                s, li = inp
                x = gen_chunk(s * rows, rows)
                return None, x[li]
            _, got = jax.lax.scan(
                per_chunk, None,
                (jnp.arange(n_chunks, dtype=jnp.int32),
                 jnp.asarray(local_idx)))
            return got.reshape(-1, d)

        return fetch(local)[: len(idx)]

    cfg = EngineConfig(dim=d, dtype="int8", ivf_nlist=args.nlist,
                       ivf_kmeans_iters=8, ivf_cap_factor=args.cap_factor,
                       ivf_balance=args.balance)
    timings: dict = {}
    t0 = time.perf_counter()
    iv = IVFIndex.build_streaming(make_chunks, n, cfg, chunk_rows=rows,
                                  timings=timings, sample_rows=sample_rows)
    t_build = time.perf_counter() - t0
    print(json.dumps({"stage": "ivf_build_streaming", "n": n,
                      "nlist": args.nlist, "cap": iv.cap,
                      "seconds": round(t_build, 1),
                      "hbm_gb": round(iv.nbytes / 1e9, 2),
                      "phase_breakdown_s": timings}), flush=True)

    # ---- phase C: recall@10 vs the oracle + latency per nprobe ------------
    for nprobe in (int(s) for s in args.nprobes.split(",")):
        _, ii = iv.search(q, k=k, nprobe=nprobe, batched=True)
        rec = recall_at_k(np.asarray(ii), i_oracle)

        def one(qrow, cents, bk, bids, sc, npb=nprobe):
            return _ivf_dispatch(qrow, cents, bk, bids, sc, k=k, nprobe=npb,
                                 batched=False, quant="int8", cosine=True)[0]

        t1 = device_time(one, q[:, None, :], iv.centroids, iv.buckets,
                         iv.bucket_ids, iv.bucket_scales)

        def many(qb, cents, bk, bids, sc, npb=nprobe):
            return _ivf_dispatch(qb, cents, bk, bids, sc, k=k, nprobe=npb,
                                 batched=True, quant="int8", cosine=True)[0]

        tb = device_time(many, qs, iv.centroids, iv.buckets, iv.bucket_ids,
                         iv.bucket_scales)
        print(json.dumps({
            "stage": "ivf_recall", "engine": "ivf_int8_10m_clustered",
            "nprobe": nprobe, "k": k,
            "recall_at_10_vs_exact_int8": round(rec, 4),
            "latency_us_b1": round(t1 * 1e6, 1),
            "qps_single_stream": round(1 / t1, 1),
            "ms_per_batch_b64": round(tb * 1e3, 3),
            "qps_b64": round(b / tb, 1),
            "speedup_vs_exact_b64": round(t_flat / tb, 2)}), flush=True)


if __name__ == "__main__":
    main()
