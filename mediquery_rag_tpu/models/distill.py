"""Draft distillation for speculative decoding.

Speculative decoding's speedup is set by the ACCEPTANCE RATE — how often
the draft's greedy proposals match the target's (models/speculative.py).
A randomly-initialized draft accepts ~1/vocab; the fix is sequence-level
knowledge distillation: the target greedy-generates continuations for a
prompt distribution, and the draft trains next-token cross-entropy on
exactly those sequences. Greedy agreement is the literal training
objective's argmax — the tightest proxy for acceptance.

Distillation happens at the TOKEN level (Generator.generate_tokens), not
on decoded text: acceptance compares raw token ids, and re-encoding
decoded strings loses the stream — BPE re-tokenization drifts at merge
boundaries, and byte-level decode drops ids outside the byte range — so
a text-distilled draft can reproduce the STRING perfectly yet still be
rejected token-by-token.

This is the standard draft-training recipe (used for real 7B+0.5B pairs);
with in-repo toy targets it demonstrably lifts acceptance well above the
random floor (tests/test_speculative.py::TestDistill), and the same
function distills a draft for an HF-imported target unchanged.

Reference seam: accelerates the chat completions the reference rented
from Ollama (medical_engine.py:46), which had no speculative/draft path.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mediquery_rag_tpu.config import DecoderConfig, TrainConfig
from mediquery_rag_tpu.models.generate import Generator, _round_up
from mediquery_rag_tpu.models.train_lm import LMBatch, LMTrainer


def distill_draft(
    target: Generator,
    draft_cfg: DecoderConfig,
    prompts: Sequence[str],
    *,
    max_new_tokens: int = 64,
    epochs: int = 30,
    train_cfg: TrainConfig | None = None,
    seed: int = 0,
    mesh=None,
) -> Generator:
    """Train a ``draft_cfg`` model to imitate ``target``'s greedy
    continuations of ``prompts``. Returns a ready ``Generator`` sharing
    the target's tokenizer (same vocab — required by
    SpeculativeGenerator)."""
    if draft_cfg.vocab_size != target.cfg.vocab_size:
        raise ValueError("draft vocab must match the target's")

    tok = target.tokenizer
    gen_rows = target.generate_tokens(list(prompts),
                                      max_new_tokens=max_new_tokens)
    seqs = [tok.encode(p) + row for p, row in zip(prompts, gen_rows)]

    # right-padded token batch (the LMLoader text path would re-tokenize
    # and lose the raw stream — see module docstring)
    S = _round_up(max(len(s) for s in seqs), 128)
    ids = np.full((len(seqs), S), int(tok.pad_id), np.int32)
    mask = np.zeros((len(seqs), S), np.float32)
    for r, s in enumerate(seqs):
        s = s[:S]
        ids[r, : len(s)] = s
        mask[r, : len(s)] = 1.0
    batch = LMBatch(jnp.asarray(ids), jnp.asarray(mask))

    tcfg = train_cfg or TrainConfig(lr=3e-3, warmup_steps=20, remat=False)
    trainer = LMTrainer(draft_cfg, tcfg, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(seed))
    metrics = {"loss": jnp.inf}
    for _ in range(epochs):
        state, metrics = trainer.train_step(state, batch)
    draft = Generator(draft_cfg, params=state.params, tokenizer=tok)
    draft.last_loss = float(metrics["loss"])
    return draft
