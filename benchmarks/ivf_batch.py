"""Batched IVF: query-major vs bucket-major kernel layout vs flat scan.

Quantifies the bucket-major win (ops/ivf_kernel.py): deduplicated bucket
DMAs + whole-batch MXU matmuls. One JSON line per (layout, nprobe, dtype).
Run on the real chip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--nlist", type=int, default=2048)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "int8"])
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    n, d, k, b = args.n, args.d, args.k, args.batch

    import jax
    import jax.numpy as jnp

    from mediquery_rag_tpu.config import EngineConfig
    from mediquery_rag_tpu.engine import FlatIndex, IVFIndex
    from mediquery_rag_tpu.obs.metrics import device_time, recall_at_k
    from mediquery_rag_tpu.ops import flat_search_xla
    from mediquery_rag_tpu.ops.ivf_kernel import (
        ivf_batch_search, ivf_probe_search, ivf_probe_search_int8)
    from mediquery_rag_tpu.ops.quant import int8_flat_search
    from mediquery_rag_tpu.ops.scoring import flat_search

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((1024, d)).astype(np.float32)
    asg = rng.integers(0, 1024, n)
    x = centers[asg] + 0.35 * rng.standard_normal((n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    xj = jnp.asarray(x)

    qs = np.stack([
        (x[rng.integers(0, n, b)] +
         0.05 * rng.standard_normal((b, d))).astype(np.float32)
        for _ in range(args.iters)
    ])
    qs /= np.linalg.norm(qs, axis=2, keepdims=True)
    qsj = jnp.asarray(qs)

    i_ref = np.stack(
        [np.asarray(flat_search_xla(qsj[t], xj, k)[1])
         for t in range(args.iters)])

    def emit(engine, t, recall, **extra):
        row = {"engine": engine, "n": n, "batch": b, "k": k,
               "ms_per_batch": round(t * 1e3, 3),
               "qps": round(b / t, 1),
               "recall_at_10": round(float(recall), 4)}
        row.update(extra)
        print(json.dumps(row), flush=True)

    # flat reference at this batch size (index arrays passed as explicit
    # args — closure-captured device arrays get inlined as HLO constants,
    # which the remote-compile tunnel rejects at this size)
    fb = FlatIndex.build(xj, EngineConfig(dim=d, dtype=args.dtype))
    ig = np.stack([np.asarray(fb.search(qsj[t], k=k)[1])
                   for t in range(args.iters)])
    if args.dtype == "int8":
        t = device_time(
            lambda q, cp, sp: int8_flat_search(q, cp, sp, k, n_valid=fb.n),
            qsj, fb.corpus, fb.corpus_scale)
    else:
        t = device_time(
            lambda q, cp: flat_search(q, cp, k, n_valid=fb.n), qsj, fb.corpus)
    emit(f"flat_{args.dtype}", t, recall_at_k(ig.reshape(-1, k),
                                              i_ref.reshape(-1, k)))
    del fb

    iv = IVFIndex.build(
        xj,
        EngineConfig(dim=d, dtype=args.dtype, ivf_nlist=args.nlist,
                     ivf_kmeans_iters=8),
    )
    int8 = iv.bucket_scales is not None

    for nprobe in (4, 8, 16, 32):
        def qm(q, cents, bk, bids, bsc):
            cs = jnp.dot(q, cents.T, preferred_element_type=jnp.float32)
            pid = jax.lax.top_k(cs, nprobe)[1].astype(jnp.int32)
            if int8:
                return ivf_probe_search_int8(pid, q, bk, bids, bsc, k=k)
            return ivf_probe_search(pid, q.astype(bk.dtype), bk, bids, k=k)

        def bm(q, cents, bk, bids, bsc):
            cs = jnp.dot(q, cents.T, preferred_element_type=jnp.float32)
            pid = jax.lax.top_k(cs, nprobe)[1].astype(jnp.int32)
            return ivf_batch_search(pid, q, bk, bids, k=k,
                                    bucket_scales=bsc if int8 else None)

        scales = (iv.bucket_scales if int8
                  else jnp.zeros((1, 1), jnp.float32))
        for layout, fn in (("query_major", qm), ("bucket_major", bm)):
            ig = np.stack([
                np.asarray(iv.search(qsj[t], k=k, nprobe=nprobe,
                                     batched=layout == "bucket_major")[1])
                for t in range(args.iters)])
            t = device_time(fn, qsj, iv.centroids, iv.buckets,
                            iv.bucket_ids, scales)
            emit(f"ivf_{args.dtype}_{layout}", t,
                 recall_at_k(ig.reshape(-1, k), i_ref.reshape(-1, k)),
                 nprobe=nprobe, nlist=args.nlist, cap=iv.cap)


if __name__ == "__main__":
    main()
