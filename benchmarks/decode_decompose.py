"""Decompose the long-context decode step (r3 VERDICT item 5).

The 7B int8 B=8 C=4096 decode step measures ~75-77% of the weights+KV HBM
floor while B=1 reaches 83%; the r2 dispatch-overhead hypothesis was
falsified (gate‖up fusion bought 0.5%). This benchmark attributes the
step's milliseconds by timing each component IN ISOLATION with the real
shapes, all in one session so the numbers compose:

  full        — Decoder.decode_step (the shipping program)
  cache_xs    — a scan whose body ONLY passes the KV cache through xs/ys
                and writes the cursor column (the decode scan's cache
                plumbing with zero compute). The r2 weight-streaming fix
                moved WEIGHTS out of scan xs; the cache still rides there,
                and scan xs slices materialize as HBM copies.
  weights     — token embed + per-layer matvec sweep (qkv/attn_out/
                gateup/down via the scalar-prefetch Pallas kernels) +
                final norm + lm_head; no attention, no cache.
  attn_stack  — per-layer GQA-folded flash attention reading the STACKED
                [L,...] cache zero-copy via scalar prefetch (layer=li);
                cache never enters scan xs.
  attn_xs     — same attention but with the cache sliced per layer
                through scan xs (the shipping layout's read path).

Expected identity: full ≈ weights + attn_xs + ε. The gap between attn_xs
and attn_stack is the recoverable cost of carrying the cache in the scan.

    python benchmarks/decode_decompose.py --batches 1,8 [--kv-dtype int8]

Reference seam: the Ollama qwen2.5:7b decode loop this framework replaces
(/root/reference/src/medical_engine.py:46).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--cache-len", type=int, default=4096)
    ap.add_argument("--cursor", type=int, default=3968)
    ap.add_argument("--kv-dtype", choices=("", "int8"), default="")
    ap.add_argument("--weights", type=int, choices=(8, 4), default=8,
                    help="weight-only quantization bits (int4 = the "
                         "capacity tier; r4 VERDICT weak-2 re-floor)")
    ap.add_argument("--hidden", type=int, default=3584)
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--heads", type=int, default=28)
    ap.add_argument("--kv-heads", type=int, default=4)
    ap.add_argument("--mlp-dim", type=int, default=18944)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mediquery_rag_tpu.config import DecoderConfig
    from mediquery_rag_tpu.models.decoder import (
        Decoder, KVCache, _cached_attn, _mlp_ff, _mm, _rmsnorm, _split_stream)
    from mediquery_rag_tpu.obs.metrics import device_time
    from mediquery_rag_tpu.ops.matvec import quantize_decoder_params

    cfg = DecoderConfig(hidden=args.hidden, layers=args.layers,
                        heads=args.heads, kv_heads=args.kv_heads,
                        mlp_dim=args.mlp_dim, max_len=args.cache_len,
                        param_dtype="bfloat16", kv_dtype=args.kv_dtype,
                        attn_impl="flash")
    model = Decoder(cfg)
    params = jax.jit(lambda k: quantize_decoder_params(
        model.init(k), args.weights))(jax.random.PRNGKey(0))
    wbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(params))
    L, H, KH, dh = cfg.layers, cfg.heads, cfg.kv_heads or cfg.heads, \
        cfg.hidden // cfg.heads
    C, cur = args.cache_len, args.cursor
    adt = jnp.dtype(cfg.dtype)
    int8kv = args.kv_dtype == "int8"
    kv_dt = jnp.int8 if int8kv else adt

    for B in (int(x) for x in args.batches.split(",")):
        # fabricated post-prefill cache: values are irrelevant to timing,
        # shapes/dtypes are the shipping ones. ONE jitted program so the
        # f32 intermediate never materializes (B=32 C=4096 OOMs eagerly)
        @jax.jit
        def _mk_cache():
            kk = jax.random.PRNGKey(1)
            if int8kv:
                k_ = jax.random.randint(kk, (L, B, KH, C, dh),
                                        -127, 128, jnp.int8)
                v_ = jax.random.randint(kk, (L, B, KH, C, dh),
                                        -127, 128, jnp.int8)
                ks_ = jax.random.uniform(kk, (L, B, KH, C)) * 0.02
                vs_ = jax.random.uniform(kk, (L, B, KH, C)) * 0.01
            else:
                k_ = jax.random.normal(kk, (L, B, KH, C, dh), adt)
                v_ = jax.random.normal(kk, (L, B, KH, C, dh), adt) * 0.5
                ks_ = vs_ = None
            return k_, v_, ks_, vs_

        kc, vc, ksc, vsc = jax.block_until_ready(_mk_cache())
        cache = KVCache(
            k=kc, v=vc,
            key_mask=jnp.concatenate(
                [jnp.ones((B, cur), jnp.float32),
                 jnp.zeros((B, C - cur), jnp.float32)], axis=1),
            cursor=jnp.int32(cur),
            next_pos=jnp.full((B,), cur, jnp.int32),
            k_scale=ksc, v_scale=vsc,
        )
        kv_gb = (cache.k.nbytes + cache.v.nbytes
                 + (cache.k_scale.nbytes + cache.v_scale.nbytes
                    if int8kv else 0))
        toks = jnp.asarray(
            np.random.default_rng(0).integers(1, 200, (args.iters, B)),
            jnp.int32)

        def t_ms(fn, *consts):
            return device_time(fn, toks, *consts, reps=3) * 1e3

        # -- full step, both cache layouts (same session = honest A/B) ------
        # decode_step routes flash configs to the stacked zero-copy layout
        # (cache = scan constant, fresh column folded via (o, m, l), ONE
        # post-scan column write); _decode_step_xs is the r3 shipping
        # layout (cache through scan xs/ys — a full HBM copy each way)
        step = jax.jit(model.decode_step)
        full = t_ms(lambda tk, pp, ca: step(pp, ca, tk)[0][:, 0], params,
                    cache)
        step_xs = jax.jit(model._decode_step_xs)
        full_xs = t_ms(lambda tk, pp, ca: step_xs(pp, ca, tk)[0][:, 0],
                       params, cache)

        # -- cache-through-scan-xs only -------------------------------------
        def cache_xs(tk, ks, vs):
            col = (tk[:, None, None, None]
                   .astype(kv_dt if int8kv else adt))    # [B,1,1,1]
            col_k = jnp.broadcast_to(col, (B, KH, 1, dh)).astype(kv_dt)

            def layer(carry, xs):
                k_layer, v_layer = xs
                k_layer = jax.lax.dynamic_update_slice(
                    k_layer, col_k, (0, 0, cur, 0))
                v_layer = jax.lax.dynamic_update_slice(
                    v_layer, col_k, (0, 0, cur, 0))
                carry = carry + k_layer[0, 0, 0, 0].astype(jnp.float32)
                return carry, (k_layer, v_layer)

            acc, (k2, v2) = jax.lax.scan(layer, jnp.float32(0), (ks, vs))
            return acc + k2[0, 0, 0, 0, 0].astype(jnp.float32) \
                + v2[-1, 0, 0, 0, 0].astype(jnp.float32)

        xs_only = t_ms(jax.jit(cache_xs), cache.k, cache.v)

        # -- weights only ---------------------------------------------------
        mats, rest = _split_stream(params["blocks"])
        li = jnp.arange(L, dtype=jnp.int32)

        def weights_only(tk, pp, mats_):
            x = pp["tok_embed"][tk[:, None]].astype(adt)

            def layer(carry, xs):
                x = carry
                lp, li_ = xs
                mm = lambda h_, n: _mm(h_, mats_[n], adt, layer=li_)
                h = _rmsnorm(x, lp["rms1"], cfg.rms_eps)
                qkv = mm(h, "qkv")
                if "qkv_b" in lp:
                    qkv = qkv + lp["qkv_b"].astype(jnp.float32)
                # stand-in for attention output with the right shape
                ctx = qkv[..., :cfg.hidden].astype(adt)
                x = x + mm(ctx, "attn_out").astype(adt)
                h = _rmsnorm(x, lp["rms2"], cfg.rms_eps)
                ff = _mlp_ff(mm, h, mats_, adt)
                ff = mm(ff, "w_down")
                return x + ff.astype(adt), None

            x, _ = jax.lax.scan(layer, x, (rest, li))
            x = _rmsnorm(x, pp["rms_f"], cfg.rms_eps)
            return _mm(x[:, 0], pp["lm_head"], adt)[:, 0]

        weights = t_ms(jax.jit(weights_only), params, mats)

        # -- attention only, stacked zero-copy read -------------------------
        qs = jax.random.normal(jax.random.PRNGKey(2), (B, H, 1, dh), adt)
        fmask = cache.key_mask

        def attn_stack(tk, ks, vs, kss, vss):
            q = qs * tk[:, None, None, None].astype(adt)

            def layer(carry, li_):
                ctx = _cached_attn(q, ks, vs, kss, vss, None, adt, dh,
                                   flash_mask=fmask, layer=li_)
                return carry + ctx[0, 0, 0, 0], None

            acc, _ = jax.lax.scan(layer, jnp.float32(0), li)
            return acc

        a_stack = t_ms(jax.jit(attn_stack), cache.k, cache.v,
                       cache.k_scale, cache.v_scale)

        # -- attention only, cache through scan xs (shipping read path) -----
        def attn_xs(tk, ks, vs, kss, vss):
            q = qs * tk[:, None, None, None].astype(adt)

            def layer(carry, xs):
                if int8kv:
                    k_layer, v_layer, ksl, vsl = xs
                else:
                    k_layer, v_layer = xs
                    ksl = vsl = None
                ctx = _cached_attn(q, k_layer, v_layer, ksl, vsl, None,
                                   adt, dh, flash_mask=fmask)
                carry = carry + ctx[0, 0, 0, 0]
                return carry, (k_layer, v_layer)

            xs = (ks, vs, kss, vss) if int8kv else (ks, vs)
            acc, (k2, v2) = jax.lax.scan(layer, jnp.float32(0), xs)
            return acc + k2[0, 0, 0, 0, 0].astype(jnp.float32)

        a_xs = t_ms(jax.jit(attn_xs), cache.k, cache.v,
                    cache.k_scale, cache.v_scale)

        w_floor = wbytes / 819e9 * 1e3
        kv_floor = kv_gb / 819e9 * 1e3
        print(json.dumps({
            "metric": "decode_step_decomposition",
            "model": f"7B-class-int{args.weights}", "batch": B, "cache_len": C,
            "cursor": cur, "kv_dtype": args.kv_dtype or "bf16",
            "full_ms": round(full, 2),
            "full_xs_ms": round(full_xs, 2),
            "weights_only_ms": round(weights, 2),
            "attn_stacked_ms": round(a_stack, 2),
            "attn_scan_xs_ms": round(a_xs, 2),
            "cache_xs_passthrough_ms": round(xs_only, 2),
            "weights_plus_attn_xs_ms": round(weights + a_xs, 2),
            "floor_weights_ms": round(w_floor, 2),
            "floor_kv_ms": round(kv_floor, 2),
            "floor_total_ms": round(w_floor + kv_floor, 2),
            "pct_of_floor": round(100 * (w_floor + kv_floor) / full, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
