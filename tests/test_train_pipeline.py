"""Training-data pipeline + end-to-end tiny training run on the corpus."""

import jax
import numpy as np

from mediquery_rag_tpu.config import EmbedderConfig, TrainConfig
from mediquery_rag_tpu.ingest import parse_corpus_file
from mediquery_rag_tpu.models import HashCharTokenizer
from mediquery_rag_tpu.models.data import PairLoader, pairs_from_chunks
from mediquery_rag_tpu.models.trainer import ContrastiveTrainer

TINY = EmbedderConfig(vocab_size=512, hidden=64, layers=2, heads=4,
                      mlp_dim=128, max_len=128, dtype="float32")


def test_pairs_from_corpus():
    chunks = parse_corpus_file("data/medical_data.txt")
    pairs = pairs_from_chunks(chunks)
    assert len(pairs) == 12
    assert all(q and d for q, d in pairs)


def test_loader_shapes_and_shuffle():
    pairs = [(f"问{i}", f"答{i}" * 20) for i in range(16)]
    tok = HashCharTokenizer(512, 128)
    loader = PairLoader(pairs, tok, batch_size=4, seed=0)
    batches = list(loader.batches(epochs=2))
    assert len(batches) == 8
    b = batches[0]
    assert b.q_ids.shape[0] == 4 and b.q_ids.shape == b.q_mask.shape


def test_training_on_corpus_improves_retrieval():
    """A few InfoNCE steps on the sample corpus must raise query->own-doc
    retrieval accuracy above the random-init baseline."""
    chunks = parse_corpus_file("data/medical_data.txt")
    pairs = pairs_from_chunks(chunks)
    tok = HashCharTokenizer(TINY.vocab_size, TINY.max_len)
    trainer = ContrastiveTrainer(TINY, TrainConfig(
        batch_size=12, lr=3e-4, warmup_steps=2, remat=False))
    state = trainer.init_state(jax.random.PRNGKey(0))

    def accuracy(params):
        import jax.numpy as jnp
        q_ids, q_mask = tok.batch_encode([q for q, _ in pairs])
        d_ids, d_mask = tok.batch_encode([d for _, d in pairs])
        qe = trainer.model.apply(params, jnp.asarray(q_ids), jnp.asarray(q_mask))
        de = trainer.model.apply(params, jnp.asarray(d_ids), jnp.asarray(d_mask))
        pred = np.argmax(np.asarray(qe @ de.T), axis=1)
        return float((pred == np.arange(len(pairs))).mean())

    acc0 = accuracy(state.params)
    loader = PairLoader(pairs, tok, batch_size=12, seed=0)
    losses = []
    for batch in loader.batches(epochs=30):
        state, m = trainer.train_step(state, batch)
        losses.append(float(m["loss"]))
    acc1 = accuracy(state.params)
    assert losses[-1] < losses[0]
    assert acc1 >= max(acc0, 0.5), (acc0, acc1)
