"""Query-batch scaling probe for the int4/int8 flat scans.

Distinguishes the int4 kernel's binding resource at the headline config:
if the scan is HBM-bound, time/batch is ~flat in B (corpus bytes dominate);
if it is MXU-bound at reduced utilization (M=B < the 128-wide systolic
array), halving B doubles time/batch and B=128 costs the same as B=64.

    python benchmarks/int4_bscale.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batches", default="32,64,128,256")
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--tile-int4", type=int, default=10240)
    ap.add_argument("--tile-int8", type=int, default=6144)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mediquery_rag_tpu.obs.metrics import device_time
    from mediquery_rag_tpu.ops.quant import (
        int4_flat_search, int8_flat_search, quantize_rows,
        quantize_rows_int4)

    N, D, K = args.n, args.d, args.k
    TC4, TC8 = args.tile_int4, args.tile_int8
    n_pad4 = -(-N // TC4) * TC4
    n_pad8 = -(-N // TC8) * TC8

    @jax.jit
    def _mk():
        c = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
        c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
        c8, cs = quantize_rows(c)
        c8p = jnp.pad(c8, ((0, n_pad8 - N), (0, 0)))
        csp = jnp.pad(cs, ((0, n_pad8 - N),))
        c4, cs4 = quantize_rows_int4(c)
        c4p = jnp.pad(c4, ((0, n_pad4 // 2 - c4.shape[0]), (0, 0)))
        cs4p = jnp.pad(cs4, ((0, 0), (0, n_pad4 // 2 - cs4.shape[1])))
        return c8p, csp, c4p, cs4p

    c8p, csp, c4p, cs4p = jax.block_until_ready(_mk())

    rows = []
    for b in (int(x) for x in args.batches.split(",")):
        q = jax.random.normal(jax.random.PRNGKey(1), (args.iters, b, D),
                              jnp.float32)
        q = jax.block_until_ready(q / jnp.linalg.norm(q, axis=-1,
                                                      keepdims=True))
        t4 = device_time(
            lambda qq, cp, sp: int4_flat_search(
                qq, cp, sp, K, n_valid=N, corpus_tile=TC4), q, c4p, cs4p)
        t8 = device_time(
            lambda qq, cp, sp: int8_flat_search(
                qq, cp, sp, K, n_valid=N, corpus_tile=TC8), q, c8p, csp)
        rows.append({"b": b, "int4_ms": round(t4 * 1e3, 4),
                     "int4_qps": round(b / t4, 1),
                     "int8_ms": round(t8 * 1e3, 4),
                     "int8_qps": round(b / t8, 1)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"metric": "int4_bscale", "n": N, "d": D, "k": K,
                      "tile_int4": TC4, "tile_int8": TC8, "rows": rows,
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
