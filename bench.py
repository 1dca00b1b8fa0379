"""Headline benchmark: flat exact search QPS/chip at recall@10 (BASELINE).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

- corpus: 1M x 768 bf16 (the per-chip shard a v5e-8 would hold of the 10M
  BASELINE config-5 corpus), query batch 64, k=10.
- value: fused-Pallas-kernel QPS on the real chip.
- vs_baseline: speedup over the measured naive XLA path (materialize [B,N]
  scores + lax.top_k) on the same chip — the honest stand-in for the
  reference's retrieval stack, which cannot run here (Chroma/hnswlib are
  CPU-side C++; typical hnswlib throughput at this recall is O(1e3-1e4) QPS
  on a full CPU host, see BASELINE.md).
- recall@10 is computed against an f32 brute-force oracle on-device.

Timing uses obs.metrics.device_time (scan-amortized, relay-proof — see
.claude/skills/verify/SKILL.md for why naive timing lies here).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from mediquery_rag_tpu.obs.metrics import device_time, recall_at_k
from mediquery_rag_tpu.ops.scoring import flat_search, flat_search_xla

N, D, B, K = 1_000_000, 768, 64, 10
TC, QT = 2048, 64
ITERS = 32   # two-point timing differences 32 vs 16 iterations; a larger
             # span amortizes relay jitter (~100 ms/round trip) better


def main() -> None:
    from mediquery_rag_tpu.ops.quant import int8_flat_search, quantize_rows

    key = jax.random.PRNGKey(0)
    c = jax.random.normal(key, (N, D), dtype=jnp.float32)
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
    c_bf16 = c.astype(jnp.bfloat16)
    n_pad = -(-N // TC) * TC
    c_pad = jnp.pad(c_bf16, ((0, n_pad - N), (0, 0)))
    c8, cs = quantize_rows(c)
    c8p = jnp.pad(c8, ((0, n_pad - N), (0, 0)))
    csp = jnp.pad(cs, ((0, n_pad - N),))

    qs = jax.random.normal(jax.random.PRNGKey(1), (ITERS, B, D), dtype=jnp.float32)
    qs = (qs / jnp.linalg.norm(qs, axis=-1, keepdims=True))

    # recall vs f32 oracle
    _, i_ref = flat_search_xla(qs[0], c, K)
    _, i_bf = flat_search(qs[0], c_pad, K, n_valid=N, query_tile=QT, corpus_tile=TC)
    recall_bf16 = recall_at_k(i_bf, i_ref)
    _, i_i8 = int8_flat_search(qs[0], c8p, csp, K, n_valid=N, corpus_tile=TC)
    recall_int8 = recall_at_k(i_i8, i_ref)

    t_bf16 = device_time(
        lambda q, cp: flat_search(
            q, cp, K, n_valid=N, query_tile=QT, corpus_tile=TC), qs, c_pad)
    t_int8 = device_time(
        lambda q, cp, sp: int8_flat_search(
            q, cp, sp, K, n_valid=N, corpus_tile=TC), qs, c8p, csp)
    t_xla = device_time(lambda q, cc: flat_search_xla(q, cc, K), qs, c_bf16)

    result = {
        "metric": "exact_search_qps_per_chip_int8",
        "value": round(B / t_int8, 1),
        "unit": "QPS (1M x 768-d int8+scales, B=64, k=10, v5e chip)",
        "vs_baseline": round(t_xla / t_int8, 3),
        "recall_at_10_int8_vs_f32": recall_int8,
        "recall_at_10_bf16_vs_f32": recall_bf16,
        "int8_ms_per_batch": round(t_int8 * 1e3, 3),
        "bf16_ms_per_batch": round(t_bf16 * 1e3, 3),
        "bf16_qps": round(B / t_bf16, 1),
        "xla_naive_bf16_ms_per_batch": round(t_xla * 1e3, 3),
        "hbm_floor_ms_bf16": round(n_pad * D * 2 / 819e9 * 1e3, 3),
        "hbm_floor_ms_int8": round(n_pad * (D + 4) / 819e9 * 1e3, 3),
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
