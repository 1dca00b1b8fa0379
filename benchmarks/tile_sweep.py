"""Same-session corpus-tile sweep for the headline scan kernels.

The r2/r3 sweeps disagreed on the best int4 tile (10240 at 0.598 ms in r2,
4096 at 0.558 ms in r3) and bench.py's shipped tile measured 0.73-0.76 ms
in the r4 session — tile ranking is not stable across the 25-35%
day-to-day chip drift. This harness re-ranks candidates in ONE session
with the exact bench.py prep + kernels so a retune is always same-session
evidence, not a cross-session comparison.

    python benchmarks/tile_sweep.py [--n 1000000] [--reps 3]

Prints one JSON line per (dtype, tile) with ms/batch and % of HBM floor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INT8_TILES = (2048, 4096, 6144)      # 8192 VMEM-OOMs (scoped-vmem limit)
INT4_TILES = (4096, 6144, 8192, 10240, 16384)
BF16_TILES = (1024, 2048, 4096)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-bf16", action="store_true")
    ap.add_argument("--dtypes", default="bf16,int8,int4",
                    help="comma list of dtypes to sweep")
    args = ap.parse_args()
    want = set(args.dtypes.split(","))

    import jax
    import jax.numpy as jnp

    import bench
    from mediquery_rag_tpu.obs.metrics import device_time
    from mediquery_rag_tpu.ops.quant import int4_flat_search, int8_flat_search
    from mediquery_rag_tpu.ops.scoring import flat_search

    n, k = args.n, bench.K
    data = bench.prep_corpus(n=n)
    _, c_bf16, c_pad, c8p, csp, c4p, cs4p, qs = data
    floors = {"bf16": n * 768 * 2 / 819e9 * 1e3,
              "int8": n * (768 + 4) / 819e9 * 1e3,
              "int4": n * (768 / 2 + 4) / 819e9 * 1e3}

    def pad_rows(a, rows):
        return jnp.pad(a, ((0, rows - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))

    results = []

    # corpus arrays ride as EXPLICIT device_time args, never closures —
    # a closed-over corpus serializes into the remote-compile request
    # (the documented 1.6 GB / 30-min-hang failure mode).
    def run(dtype, tile, fn, *corpus_args):
        try:
            ms = device_time(fn, qs, *corpus_args, reps=args.reps) * 1e3
        except Exception as e:  # e.g. scoped-VMEM OOM at big tiles
            print(json.dumps({"dtype": dtype, "tile": tile,
                              "error": str(e)[:160]}), flush=True)
            return
        row = {"dtype": dtype, "tile": tile, "ms_per_batch": round(ms, 3),
               "pct_of_floor": round(100 * floors[dtype] / ms, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    if not args.skip_bf16 and "bf16" in want:
        for t in BF16_TILES:
            rows = -(-n // t) * t
            cp = pad_rows(c_bf16, rows)
            run("bf16", t,
                lambda q, cp, t=t: flat_search(
                    q, cp, k, n_valid=n, query_tile=bench.QT, corpus_tile=t),
                cp)

    for t in INT8_TILES if "int8" in want else ():
        rows = -(-n // t) * t
        c8 = pad_rows(c8p[:n], rows)
        cs = pad_rows(csp[:n], rows)
        run("int8", t,
            lambda q, c8, cs, t=t: int8_flat_search(
                q, c8, cs, k, n_valid=n, corpus_tile=t),
            c8, cs)

    for t in INT4_TILES if "int4" in want else ():
        rows = -(-n // t) * t
        c4 = pad_rows(c4p[: n // 2], rows // 2)
        cs4 = jnp.pad(cs4p[:, : n // 2],
                      ((0, 0), (0, rows // 2 - n // 2)))
        run("int4", t,
            lambda q, c4, cs4, t=t: int4_flat_search(
                q, c4, cs4, k, n_valid=n, corpus_tile=t),
            c4, cs4)

    best = {}
    for r in results:
        cur = best.get(r["dtype"])
        if cur is None or r["ms_per_batch"] < cur["ms_per_batch"]:
            best[r["dtype"]] = r
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
