"""The ENTIRE reference stack on ONE TPU chip, measured end to end.

The reference ran three separate engines — Ollama's CPU GGML for the LLM,
Ollama again for embeddings, Chroma/hnswlib for vectors — as independent
processes. This bench makes them co-resident on a single v5e chip:

  - a 7B-class LLM (qwen2.5-7b dims incl. GQA 28q/4kv), int8 weight-only
    serving via the Pallas streaming matvec          (~6.5 GB)
  - a 10M x 768 int4 row-pair flat index, exact search (~3.9 GB)
  - the 768-d query embedder forward                  (~0.4 GB)

and drives the RAG hot path per batch: embed -> exact 10M search ->
prompt build -> 64-token generation. Timing is client-observed wall clock
THROUGH the axon relay (a conservative upper bound: each stage pays
~30-100 ms of tunnel round trip that co-located serving would not).

One JSON line per phase + a final summary line.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from mediquery_rag_tpu.config import DecoderConfig, EmbedderConfig
    from mediquery_rag_tpu.models import TextEmbedder
    from mediquery_rag_tpu.models.decoder import Decoder
    from mediquery_rag_tpu.models.generate import Generator
    from mediquery_rag_tpu.ops.matvec import quantize_decoder_params
    from mediquery_rag_tpu.ops.quant import int4_flat_search, quantize_rows_int4

    t_all = time.perf_counter()

    # ---- Index: 10M x 768 int4, generated+packed on device ----------------
    # (built FIRST, with donated in-place chunk updates: allocating the big
    # static residents before the LLM keeps the heap unfragmented — the
    # non-donated variant OOMed the RAG loop with 5 GB nominally free)
    N, D, K = 10_000_000, 768, 5
    TC = 6144
    n_pad = -(-N // TC) * TC
    ch = 500_000

    t0 = time.perf_counter()
    buf = jnp.zeros((n_pad // 2, D), jnp.int8)
    scales = jnp.zeros((2, n_pad // 2), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def fill(buf, scales, seed, start):
        x = jax.random.normal(jax.random.PRNGKey(seed), (ch, D), jnp.float32)
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        q, s = quantize_rows_int4(x)
        buf = jax.lax.dynamic_update_slice(buf, q, (start // 2, 0))
        scales = jax.lax.dynamic_update_slice(scales, s, (0, start // 2))
        return buf, scales

    for i in range(N // ch):
        buf, scales = fill(buf, scales, i, i * ch)
    jax.block_until_ready(buf)
    print(json.dumps({"stage": "index_build", "n": N,
                      "hbm_gb": round(buf.nbytes / 1e9, 2),
                      "seconds": round(time.perf_counter() - t0, 1)}),
          flush=True)

    # ---- LLM: 7B-class GQA, int8 weights, built quantized under one jit ----
    dcfg = DecoderConfig(hidden=3584, layers=28, heads=28, kv_heads=4,
                         mlp_dim=18944, max_len=512, param_dtype="bfloat16")
    model = Decoder(dcfg)
    t0 = time.perf_counter()
    params = jax.jit(lambda k: quantize_decoder_params(model.init(k)))(
        jax.random.PRNGKey(0))
    gen = Generator(dcfg, params=params)
    llm_gb = sum(x.nbytes for x in jax.tree_util.tree_leaves(params)) / 1e9
    print(json.dumps({"stage": "llm_init", "weights_gb": round(llm_gb, 2),
                      "seconds": round(time.perf_counter() - t0, 1)}),
          flush=True)

    # ---- Embedder: the 768-d encoder forward ------------------------------
    ecfg = EmbedderConfig(vocab_size=8192, hidden=768, layers=12, heads=12,
                          mlp_dim=2048, max_len=128)
    te = TextEmbedder(ecfg)
    emb_gb = sum(x.nbytes
                 for x in jax.tree_util.tree_leaves(te.params)) / 1e9
    print(json.dumps({"stage": "embedder_init",
                      "weights_gb": round(emb_gb, 2)}), flush=True)

    # ---- the RAG hot path: embed -> search -> prompt -> generate ----------
    B = 8
    questions = [f"高血压患者第{i}天的饮食应该注意什么？" for i in range(B)]

    def rag_batch(max_new):
        e = te.embed(questions)                       # [B, 768] on device
        e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
        s, i = int4_flat_search(e.astype(jnp.float32), buf, scales, K,
                                n_valid=N, query_tile=64, corpus_tile=TC)
        ids = np.asarray(i)                           # host hop, as serving
        prompts = [
            f"资料: 文档{list(ids[r])}\n问题: {questions[r]}\n回答:"
            for r in range(B)
        ]
        return gen.generate(prompts, max_new_tokens=max_new,
                            temperature=1.0)

    rag_batch(64)                                     # compile everything
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = rag_batch(64)
        times.append(time.perf_counter() - t0)
    t_loop = min(times)
    total_gb = llm_gb + buf.nbytes / 1e9 + scales.nbytes / 1e9 + emb_gb
    print(json.dumps({
        "stage": "rag_loop",
        "batch": B,
        "seconds_per_batch": round(t_loop, 2),
        "queries_per_s": round(B / t_loop, 2),
        "new_tokens_per_answer": 64,
        "resident_hbm_gb": round(total_gb, 2),
        "note": ("embed + exact 10M-vector search + 64-token 7B-GQA-int8 "
                 "generation, client wall clock through the relay"),
    }), flush=True)
    print(json.dumps({"stage": "done",
                      "total_seconds": round(time.perf_counter() - t_all, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
