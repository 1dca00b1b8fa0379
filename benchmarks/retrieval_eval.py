"""Held-out retrieval quality: train on the corpus, eval on unseen phrasings.

VERDICT r1 ("model evals are self-referential" / task 3): the embedder's
quality was only measured on its own training pairs. This benchmark trains
the in-repo encoder on the 160-chunk corpus (title -> content InfoNCE,
the same recipe as models/train.py) and reports recall@k on
data/heldout_queries.tsv — 72 original colloquial paraphrases that appear
nowhere in the corpus — alongside the train-title recall so the
generalization gap is explicit.

    python benchmarks/retrieval_eval.py                 # real chip
    python benchmarks/retrieval_eval.py --layers 2 --epochs 8   # quick

Reference capability being measured: /root/reference/src/medical_engine.py:43
(pretrained dmeta-embedding-zh answering unseen user questions).
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
    ap.add_argument("--heldout", default="data/heldout_queries.tsv")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--layers", type=int, default=4,
                    help="encoder depth (160 chunks do not need 12 layers)")
    ap.add_argument("--max-len", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save", default="",
                    help="optional checkpoint dir for the trained embedder")
    args = ap.parse_args()

    import jax

    from mediquery_rag_tpu.config import EmbedderConfig, TrainConfig
    from mediquery_rag_tpu.ingest import parse_corpus_file
    from mediquery_rag_tpu.models import HashCharTokenizer, TextEmbedder
    from mediquery_rag_tpu.models.data import PairLoader, pairs_from_chunks
    from mediquery_rag_tpu.models.eval import load_heldout, retrieval_recall
    from mediquery_rag_tpu.models.trainer import ContrastiveTrainer

    chunks = parse_corpus_file(args.corpus)
    pairs = pairs_from_chunks(chunks)
    heldout = load_heldout(args.heldout)
    print(f"corpus: {len(chunks)} chunks; heldout: {len(heldout)} queries")

    mcfg = EmbedderConfig(layers=args.layers, max_len=args.max_len)
    tcfg = TrainConfig(batch_size=args.batch_size, lr=args.lr,
                       warmup_steps=20)
    tok = HashCharTokenizer(mcfg.vocab_size, mcfg.max_len)
    loader = PairLoader(pairs, tok, args.batch_size, seed=args.seed,
                        max_len=args.max_len)
    trainer = ContrastiveTrainer(mcfg, tcfg)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))

    t0 = time.time()
    step = 0
    for batch in loader.batches(epochs=args.epochs):
        state, metrics = trainer.train_step(state, batch)
        step += 1
        if step % 50 == 0 or step == 1:
            print(f"step {step:5d}  loss {float(metrics['loss']):.4f}  "
                  f"{time.time() - t0:.1f}s")
    print(f"trained {step} steps in {time.time() - t0:.1f}s")

    te = TextEmbedder(mcfg, params=jax.device_get(state.params))
    if args.save:
        te.save(args.save)
        print(f"saved -> {args.save}")

    # embed what the ingest pipeline embeds (chunk.text = 问题+答案 render,
    # ingest/pipeline.py:148) — this measures the shipping path
    docs = [c.text for c in chunks]
    doc_ids = [c.chunk_id for c in chunks]
    h_q = [q for _, q in heldout]
    h_gold = [cid for cid, _ in heldout]
    held = retrieval_recall(te.embed, docs, doc_ids, h_q, h_gold)
    train = retrieval_recall(
        te.embed, docs, doc_ids,
        [c.title for c in chunks], doc_ids)

    # baselines + the SHIPPING config: lexical hashing alone, and the hybrid
    # lexical+trained fusion the CLI auto-loads (cli/context.py) — reported
    # here so the defaults are backed by this benchmark, not folklore
    from mediquery_rag_tpu.models import HashingEmbedder, HybridEmbedder
    lex = HashingEmbedder(768)
    held_lex = retrieval_recall(lex, docs, doc_ids, h_q, h_gold)
    hybrid_sweep = {}
    for w in (0.6, 0.7, 0.8, 0.9):
        hy = HybridEmbedder(lex, te.embed, w_lex=w)
        hybrid_sweep[f"w_lex={w}"] = retrieval_recall(
            hy, docs, doc_ids, h_q, h_gold)
    print(json.dumps({
        "heldout_trained": held, "heldout_hashing": held_lex,
        "heldout_hybrid": hybrid_sweep, "train_titles": train,
        "n_docs": len(docs), "n_heldout": len(heldout),
        "layers": args.layers, "epochs": args.epochs,
    }, indent=2))


if __name__ == "__main__":
    main()
