"""Same-session A/B for the quantized-scan score-fold change.

RESULTS.md records 25-35% day-to-day drift in whole-chip rates through
the relay, so kernel changes are only judged by SAME-PROCESS A/B: this
loads the pre-change ops/quant.py out of git (``--old-rev``, default
HEAD) as a second module and times both versions back-to-back on the
bench config (1M x 768, B=64, k=10, device_time two-point scan timing).

    python benchmarks/int4_ab.py              # working tree vs HEAD
    python benchmarks/int4_ab.py --old-rev <sha>
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_rev_quant(rev: str):
    """Import ``mediquery_rag_tpu/ops/quant.py`` as of ``rev`` (its imports
    are absolute, so it loads standalone against the working-tree package)."""
    src = subprocess.check_output(
        ["git", "show", f"{rev}:mediquery_rag_tpu/ops/quant.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    with tempfile.NamedTemporaryFile("wb", suffix="_quant_old.py",
                                     delete=False) as f:
        f.write(src)
        path = f.name
    spec = importlib.util.spec_from_file_location("quant_old", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-rev", default="HEAD")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--tile-int4", type=int, default=10240)
    ap.add_argument("--tile-int8", type=int, default=6144)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import mediquery_rag_tpu.ops.quant as quant_new
    from mediquery_rag_tpu.obs.metrics import device_time

    quant_old = load_rev_quant(args.old_rev)

    N, D, B, K = args.n, args.d, args.b, args.k
    TC4, TC8 = args.tile_int4, args.tile_int8
    n_pad4 = -(-N // TC4) * TC4
    n_pad8 = -(-N // TC8) * TC8

    @jax.jit
    def _mk():
        c = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
        c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
        c8, cs = quant_new.quantize_rows(c)
        c8p = jnp.pad(c8, ((0, n_pad8 - N), (0, 0)))
        csp = jnp.pad(cs, ((0, n_pad8 - N),))
        c4, cs4 = quant_new.quantize_rows_int4(c)
        c4p = jnp.pad(c4, ((0, n_pad4 // 2 - c4.shape[0]), (0, 0)))
        cs4p = jnp.pad(cs4, ((0, 0), (0, n_pad4 // 2 - cs4.shape[1])))
        q = jax.random.normal(jax.random.PRNGKey(1), (args.iters, B, D),
                              jnp.float32)
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        return c8p, csp, c4p, cs4p, q

    c8p, csp, c4p, cs4p, qs = jax.block_until_ready(_mk())

    # equivalence first: same ids, scores close (fold reassociates f32 muls)
    import numpy as np
    s_o, i_o = quant_old.int4_flat_search(qs[0], c4p, cs4p, K, n_valid=N,
                                          corpus_tile=TC4)
    s_n, i_n = quant_new.int4_flat_search(qs[0], c4p, cs4p, K, n_valid=N,
                                          corpus_tile=TC4)
    ids_equal = bool(np.array_equal(np.asarray(i_o), np.asarray(i_n)))
    score_err = float(np.max(np.abs(np.asarray(s_o) - np.asarray(s_n))))

    out = {"metric": "int4_fold_ab", "n": N, "b": B, "k": K,
           "ids_equal": ids_equal, "score_max_abs_err": score_err,
           "backend": jax.default_backend()}
    for name, mod, extra in (
        ("int4_old", quant_old, {}), ("int4_new", quant_new, {}),
        ("int4_old2", quant_old, {}),       # drift guard: re-time old last
    ):
        t = device_time(
            lambda q, cp, sp, m=mod: m.int4_flat_search(
                q, cp, sp, K, n_valid=N, corpus_tile=TC4), qs, c4p, cs4p)
        out[f"{name}_ms"] = round(t * 1e3, 4)
    for name, mod in (("int8_old", quant_old), ("int8_new", quant_new)):
        t = device_time(
            lambda q, cp, sp, m=mod: m.int8_flat_search(
                q, cp, sp, K, n_valid=N, corpus_tile=TC8), qs, c8p, csp)
        out[f"{name}_ms"] = round(t * 1e3, 4)
    out["int4_speedup"] = round(
        min(out["int4_old_ms"], out["int4_old2_ms"]) / out["int4_new_ms"], 3)
    out["int8_speedup"] = round(out["int8_old_ms"] / out["int8_new_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
