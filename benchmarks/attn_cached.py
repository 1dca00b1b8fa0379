"""Cached-attention kernel floor bench (r4 VERDICT weak-1).

Times ``flash_attention_cached`` alone — stacked [L, ...] cache read via
scalar prefetch inside a layer scan, the exact read pattern of
``Decoder._decode_step_stacked`` — against its KV HBM floor, across the
regimes continuous batching sells: B=8/32, C=2048/4096, bf16 and int8 KV.

The r4 tables put the kernel at 52-61% of floor exactly at max occupancy;
this harness exists so kernel changes get same-session A/Bs (run once per
change; the relay drifts 25-35% day to day).

    python benchmarks/attn_cached.py [--configs 8x4096,32x2048,32x4096]
                                     [--kv-dtype bf16|int8] [--tk 2048]

One JSON line per config. Reference seam: the llama.cpp attention inside
Ollama's qwen2.5:7b serving (/root/reference/src/medical_engine.py:46).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1x4096,8x4096,32x2048,32x4096")
    ap.add_argument("--kv-dtype", choices=("bf16", "int8", "both"),
                    default="both")
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--heads", type=int, default=28)
    ap.add_argument("--kv-heads", type=int, default=4)
    ap.add_argument("--dh", type=int, default=128)
    ap.add_argument("--tk", type=int, default=0,
                    help="KV tile override (0 = kernel default)")
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mediquery_rag_tpu.obs.metrics import device_time
    from mediquery_rag_tpu.ops.attention import flash_attention_cached

    L, H, KH, dh = args.layers, args.heads, args.kv_heads, args.dh
    dtypes = ("bf16", "int8") if args.kv_dtype == "both" else (args.kv_dtype,)
    tk_kw = {} if args.tk == 0 else {"tk": args.tk}

    for cfg_s in args.configs.split(","):
        B, C = (int(x) for x in cfg_s.split("x"))
        for kvd in dtypes:
            int8kv = kvd == "int8"

            # ONE jitted program so no f32 intermediate of the full cache
            # ever materializes (B=32 C=4096 would OOM the chip eagerly)
            @jax.jit
            def _mk():
                kk = jax.random.PRNGKey(1)
                if int8kv:
                    k_ = jax.random.randint(kk, (L, B, KH, C, dh),
                                            -127, 128, jnp.int8)
                    v_ = jax.random.randint(kk, (L, B, KH, C, dh),
                                            -127, 128, jnp.int8)
                    ks_ = jax.random.uniform(kk, (L, B, KH, C)) * 0.02
                    vs_ = jax.random.uniform(kk, (L, B, KH, C)) * 0.01
                else:
                    k_ = jax.random.normal(kk, (L, B, KH, C, dh),
                                           jnp.bfloat16)
                    v_ = jax.random.normal(kk, (L, B, KH, C, dh),
                                           jnp.bfloat16) * 0.5
                    ks_ = vs_ = None
                return k_, v_, ks_, vs_

            k, v, ks, vs = jax.block_until_ready(_mk())
            mask = jnp.ones((B, C), jnp.float32)
            qs = jnp.asarray(np.random.default_rng(0)
                             .standard_normal((args.iters, B, H, 1, dh)),
                             jnp.bfloat16)
            li = jnp.arange(L, dtype=jnp.int32)

            def attn_stack(q, k_, v_, ks_, vs_):
                def layer(carry, li_):
                    o, m, l = flash_attention_cached(
                        q, k_, v_, mask, k_scale=ks_, v_scale=vs_,
                        layer=li_, return_ml=True, **tk_kw)
                    return carry + o[0, 0, 0, 0].astype(jnp.float32), None

                acc, _ = jax.lax.scan(layer, jnp.float32(0), li)
                return acc

            t = device_time(jax.jit(attn_stack), qs, k, v, ks, vs, reps=3)
            kv_bytes = k.nbytes + v.nbytes + (
                ks.nbytes + vs.nbytes if int8kv else 0)
            floor_ms = kv_bytes / 819e9 * 1e3
            t_ms = t * 1e3
            print(json.dumps({
                "metric": "cached_attn_stack",
                "batch": B, "cache_len": C, "kv_dtype": kvd,
                "layers": L, "heads": H, "kv_heads": KH,
                "tk": args.tk or "default",
                "stack_ms": round(t_ms, 3),
                "per_layer_ms": round(t_ms / L, 4),
                "floor_ms": round(floor_ms, 3),
                "pct_of_floor": round(100 * floor_ms / t_ms, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
