"""Device-time decomposition of the lockstep generate loop.

The distill_serving lockstep phase times `Generator.generate` /
`SpeculativeGenerator.generate` by wall clock; through the axon relay a
request measures ~9 s for 96 tokens of a 300M model whose decode floor is
<1 ms/token. This harness separates the two candidate explanations:

- per-request DEVICE time, measured the repo's honest way (N reps of the
  full compiled program inside one jitted lax.scan — obs.metrics.device_time);
- per-request WALL time of the same already-compiled call (dispatch +
  relay + host overhead included).

If device time is small and wall time is ~9 s, the lockstep wall-clock
speedup is compressed toward 1 by a fixed relay cost that a local host
would not pay — and the device-time ratio is the honest speculative win.

    python benchmarks/lockstep_device_time.py [--max-new 96]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="data/medical_data.txt")
    ap.add_argument("--target-epochs", type=int, default=16)
    ap.add_argument("--draft-pretrain-epochs", type=int, default=128)
    ap.add_argument("--distill-epochs", type=int, default=100)
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--max-new", type=int, default=96)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mediquery_rag_tpu.config import DecoderConfig, TrainConfig
    from mediquery_rag_tpu.ingest import parse_corpus_file
    from mediquery_rag_tpu.models.byte_tokenizer import ByteTokenizer
    from mediquery_rag_tpu.models.distill import distill_draft
    from mediquery_rag_tpu.models.generate import Generator, _round_up
    from mediquery_rag_tpu.models.speculative import SpeculativeGenerator
    from mediquery_rag_tpu.models.train_lm import (LMLoader, LMTrainer,
                                                   corpus_lm_texts)
    from mediquery_rag_tpu.obs.metrics import device_time

    # -- train target + draft exactly like distill_serving ------------------
    tcfg = DecoderConfig(hidden=1024, layers=12, heads=16, mlp_dim=2816,
                         max_len=1024)
    chunks = parse_corpus_file(args.corpus)
    texts = corpus_lm_texts(chunks)
    tok = ByteTokenizer(tcfg.max_len)
    loader = LMLoader(texts, tok, 8, seed=0)
    trainer = LMTrainer(tcfg, TrainConfig(batch_size=8, lr=3e-4,
                                          warmup_steps=20))
    state = trainer.init_state(jax.random.PRNGKey(0))
    for batch in loader.batches(epochs=args.target_epochs):
        state, m = trainer.train_step(state, batch)
    params = jax.tree_util.tree_map(
        lambda x: x.astype("bfloat16") if x.dtype == jnp.float32
        and x.ndim >= 2 else x, jax.device_get(state.params))
    del state, trainer
    target = Generator(tcfg, params=params, tokenizer=tok)
    print(f"target: loss {float(m['loss']):.3f}", flush=True)

    titles = [c.title for c in chunks if c.title]
    split = max(6, len(titles) // 5)
    eval_prompts = titles[:split][:6]
    train_prompts = titles[split:]
    held = set(eval_prompts)
    for ch in chunks:
        if ch.title and ch.title not in held:
            text = ch.text
            for start in (0, max(len(text) // 2 - 12, 0)):
                p = text[start:start + 24].strip()
                if len(p) >= 8:
                    train_prompts.append(p)
    dcfg = DecoderConfig(hidden=256, layers=4, heads=4, mlp_dim=768,
                         max_len=1024)
    dinit = None
    if args.draft_pretrain_epochs:
        dtr = LMTrainer(dcfg, TrainConfig(batch_size=8, lr=3e-3,
                                          warmup_steps=20))
        dld = LMLoader(texts, tok, 8, seed=1)
        dst = dtr.init_state(jax.random.PRNGKey(2))
        for batch in dld.batches(epochs=args.draft_pretrain_epochs):
            dst, dm = dtr.train_step(dst, batch)
        dinit = jax.device_get(dst.params)
        print(f"draft pretrain: loss {float(dm['loss']):.3f}", flush=True)
        del dst, dtr
    draft = distill_draft(target, dcfg, train_prompts[:512],
                          max_new_tokens=args.max_new,
                          epochs=args.distill_epochs, init_params=dinit,
                          train_cfg=TrainConfig(lr=3e-3, warmup_steps=20,
                                                remat=False))
    print(f"draft: distill loss {draft.last_loss:.3f}", flush=True)
    spec = SpeculativeGenerator(target, draft, gamma=args.gamma)

    # -- decompose one prompt: generate() wall vs raw dispatch vs device ----
    prompt = eval_prompts[0]
    ids_np, mask_np = tok.batch_encode([prompt])
    B, S = ids_np.shape
    max_new = min(_round_up(max(args.max_new, 1), 64), tcfg.max_len - S)
    run = target._compiled(B, S, max_new)
    zero = jnp.zeros((1,), jnp.int32)
    dargs = (target.params, jnp.asarray(ids_np), jnp.asarray(mask_np),
             jnp.float32(0.0), jax.random.PRNGKey(0),
             zero, zero[:, None], zero, jnp.int32(0))
    jax.block_until_ready(dargs[1:])

    # 1) generate() wall, steady (2nd call)
    target.generate([prompt], max_new_tokens=args.max_new)
    t0 = time.time()
    target.generate([prompt], max_new_tokens=args.max_new)
    wall_gen = time.time() - t0
    # 2) raw compiled dispatch with pre-staged args
    jax.block_until_ready(run(*dargs))
    t0 = time.time()
    jax.block_until_ready(run(*dargs))
    wall_raw = time.time() - t0
    # 3) device-only: run() N times inside ONE jitted scan (the repo's
    # scan-amortized honest-timing pattern, obs/metrics.py)
    N = args.reps

    @jax.jit
    def many(params, ids, mask, t, key, a, b, c, d):
        def body(acc, _):
            out = run(params, ids, mask, t, key, a, b, c, d)
            return acc + out.sum().astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return acc
    jax.block_until_ready(many(*dargs))
    t0 = time.time()
    jax.block_until_ready(many(*dargs))
    dev = (time.time() - t0) / N

    # spec steady wall for the ratio
    spec.generate([prompt], max_new_tokens=args.max_new)
    t0 = time.time()
    spec.generate([prompt], max_new_tokens=args.max_new)
    wall_spec = time.time() - t0
    print(json.dumps({
        "metric": "lockstep_decomposition",
        "prompt_chars": len(prompt), "max_new": max_new,
        "generate_wall_s": round(wall_gen, 3),
        "raw_dispatch_wall_s": round(wall_raw, 3),
        "device_program_s": round(float(dev), 3),
        "spec_generate_wall_s": round(wall_spec, 3),
        "tokens_per_round": spec.last_stats.get("tokens_per_round"),
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
