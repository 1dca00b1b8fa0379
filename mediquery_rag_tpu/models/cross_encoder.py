"""Cross-encoder relevance scorer — the TPU-native document grader.

The reference grades retrieved documents with an LLM round trip per loop
step ("yes"/"no" on the first two docs, reference core/utils.py:64-72) —
one HTTP call into a 7B chat model to make a binary judgment. The
TPU-native alternative is a small cross-encoder: query and document jointly
encoded in ONE sequence (segment embeddings mark which is which) and scored
by a head on the pooled state — microseconds on the MXU instead of an LLM
round trip, and trainable on the same (title, content) pairs as the
bi-encoder (positives = true pairs, negatives = in-batch mismatches).

Reuses the embedder's transformer blocks (scan over stacked layers, bf16
activations, Megatron-shardable); adds segment embeddings and a scalar
score head. ``make_grader`` adapts a trained model to the graph's
``grade_fn`` plug point (graph/nodes.py).

STATUS — experimental below real data scale: at the shipping 160-chunk
corpus the trained grader memorizes (held-out AUC 0.53,
benchmarks/grader_eval.py) and the CLI deliberately routes grading
through ``SimilarityGrader`` over the lexical embedder instead
(cli/context.py; held-out balanced accuracy 0.95). Use this model class
when training data is plentiful (1e4+ labeled pairs); the architecture
and trainer are production-shaped, the 160-pair corpus is not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mediquery_rag_tpu.config import EmbedderConfig
from mediquery_rag_tpu.models.embedder import Embedder, _layernorm
from mediquery_rag_tpu.models.tokenizer import HashCharTokenizer


class CrossEncoder:
    """Functional (query, doc) scorer: ``apply -> [B] relevance logits``."""

    def __init__(self, cfg: EmbedderConfig = EmbedderConfig()):
        self.cfg = cfg
        self._enc = Embedder(cfg)

    def init(self, key: jax.Array) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        params = self._enc.init(k1)
        D = self.cfg.hidden
        params["seg_embed"] = jax.random.normal(k2, (2, D), jnp.float32) * 0.02
        params["score_w"] = jax.random.normal(k3, (D,), jnp.float32) * (D ** -0.5)
        params["score_b"] = jnp.zeros(())
        return params

    def apply(self, params: dict, ids: jax.Array, mask: jax.Array,
              seg: jax.Array, *, remat: bool = False) -> jax.Array:
        """ids/mask/seg: [B, S] (seg: 0 = query chars, 1 = doc chars).
        Returns [B] f32 relevance logits."""
        c = self.cfg
        adt = jnp.dtype(c.dtype)
        B, S = ids.shape

        x = (params["tok_embed"][ids] + params["pos_embed"][:S][None]
             + params["seg_embed"][seg])
        x = x.astype(adt)
        attn_bias = (mask[:, None, None, :] - 1.0) * 1e9

        from mediquery_rag_tpu.models.embedder import _block
        block_fn = functools.partial(
            _block, heads=c.heads, hidden=c.hidden, adt=adt,
            attn_bias=attn_bias)
        if remat:
            block_fn = jax.checkpoint(block_fn)
        x, _ = jax.lax.scan(
            lambda carry, lp: (block_fn(carry, lp), None), x,
            params["blocks"])
        x = _layernorm(x, params["ln_f_scale"], params["ln_f_bias"])
        m = mask[:, :, None]
        pooled = ((x * m).sum(axis=1)
                  / jnp.maximum(m.sum(axis=1), 1.0)).astype(jnp.float32)
        return pooled @ params["score_w"] + params["score_b"]


def encode_pairs(tok: HashCharTokenizer, queries: list[str],
                 docs: list[str], max_len: int | None = None):
    """[CLS] query-chars doc-chars as one sequence + segment ids.

    No explicit SEP token is needed: segment embeddings carry the boundary
    (and the hash vocabulary has no reserved id to spare).
    Returns (ids [B, L] i32, mask [B, L] f32, seg [B, L] i32).
    """
    max_len = tok.max_len if max_len is None else max_len
    rows, segs = [], []
    for q, d in zip(queries, docs):
        q_ids = tok.encode(q)[: max_len // 2]
        d_ids = tok.encode(d)[1:]                  # drop the doc's CLS
        ids = (q_ids + d_ids)[:max_len]
        seg = ([0] * len(q_ids) + [1] * len(d_ids))[:max_len]
        rows.append(ids)
        segs.append(seg)
    longest = max((len(r) for r in rows), default=1)
    L = min(-(-longest // 128) * 128, max_len)
    ids = np.zeros((len(rows), L), np.int32)
    mask = np.zeros((len(rows), L), np.float32)
    seg = np.zeros((len(rows), L), np.int32)
    for i, (r, s) in enumerate(zip(rows, segs)):
        r, s = r[:L], s[:L]
        ids[i, : len(r)] = r
        mask[i, : len(r)] = 1.0
        seg[i, : len(s)] = s
    return ids, mask, seg


@functools.partial(jax.jit, static_argnames=("model",), donate_argnums=(1, 2))
def _train_step(model: "CrossEncoderTrainer", params, opt_state, ids, mask,
                seg, labels):
    def loss_fn(p):
        logits = model.ce.apply(p, ids, mask, seg)
        losses = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
            jnp.exp(-jnp.abs(logits)))          # stable BCE-with-logits
        return losses.mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = model.opt.update(grads, opt_state, params)
    import optax
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


class CrossEncoderTrainer:
    """Binary relevance fine-tuning on (query, doc, label) triples."""

    def __init__(self, cfg: EmbedderConfig, lr: float = 1e-4):
        import optax

        self.ce = CrossEncoder(cfg)
        self.opt = optax.adamw(lr)
        self.cfg = cfg

    def __hash__(self):          # static arg for jit
        return hash((id(self.ce), id(self.opt)))

    def __eq__(self, other):
        return self is other

    def init(self, key):
        params = self.ce.init(key)
        return params, self.opt.init(params)

    def step(self, params, opt_state, ids, mask, seg, labels):
        return _train_step(self, params, opt_state,
                           jnp.asarray(ids), jnp.asarray(mask),
                           jnp.asarray(seg), jnp.asarray(labels, jnp.float32))


def train_cross_encoder(pairs: list[tuple[str, str]],
                        cfg: EmbedderConfig, *, epochs: int = 10,
                        batch_size: int = 8, lr: float = 1e-4,
                        seed: int = 0):
    """Train on true pairs vs shuffled-mismatch negatives. Returns
    (params, tokenizer, final_loss)."""
    rng = np.random.default_rng(seed)
    tok = HashCharTokenizer(cfg.vocab_size, cfg.max_len)
    tr = CrossEncoderTrainer(cfg, lr=lr)
    params, opt_state = tr.init(jax.random.PRNGKey(seed))
    loss = float("nan")
    n = len(pairs)
    for _ in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n, batch_size):
            sel = order[i:i + batch_size]
            qs = [pairs[j][0] for j in sel]
            ds = [pairs[j][1] for j in sel]
            # negatives: each query against a rolled (mismatched) doc
            neg_ds = [ds[(j + 1) % len(ds)] for j in range(len(ds))]
            if len(sel) < 2:
                continue
            ids, mask, seg = encode_pairs(tok, qs + qs, ds + neg_ds)
            labels = np.r_[np.ones(len(qs)), np.zeros(len(qs))]
            params, opt_state, l = tr.step(params, opt_state, ids, mask,
                                           seg, labels)
            loss = float(l)
    return params, tok, loss


class TrainedGrader:
    """Persistable document grader: cross-encoder params + config +
    threshold, loadable by the CLI (``AppContext`` wires it into the graph
    when ``checkpoints/grader`` exists)."""

    def __init__(self, params: dict, cfg: EmbedderConfig,
                 threshold: float = 0.0):
        self.params = params
        self.cfg = cfg
        self.threshold = threshold
        tok = HashCharTokenizer(cfg.vocab_size, cfg.max_len)
        self._grade = make_grader(params, tok, cfg, threshold=threshold)

    def __call__(self, question: str, doc_texts: list[str]) -> bool:
        return self._grade(question, doc_texts)

    def save(self, path: str) -> None:
        import json
        import os

        os.makedirs(path, exist_ok=True)
        flat, _ = jax.tree_util.tree_flatten(self.params)
        np.savez(os.path.join(path, "params.npz"),
                 **{str(i): np.asarray(x) for i, x in enumerate(flat)})
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump({"cfg": self.cfg.__dict__,
                       "threshold": self.threshold}, f)

    @classmethod
    def from_checkpoint(cls, path: str) -> "TrainedGrader":
        import json
        import os

        with open(os.path.join(path, "config.json")) as f:
            meta = json.load(f)
        cfg = EmbedderConfig(**meta["cfg"])
        template = CrossEncoder(cfg).init(jax.random.PRNGKey(0))
        flat, treedef = jax.tree_util.tree_flatten(template)
        z = np.load(os.path.join(path, "params.npz"))
        if len(z.files) != len(flat):
            raise ValueError(f"grader checkpoint at {path} does not match "
                             "this architecture")
        params = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(z[str(i)]) for i in range(len(flat))])
        return cls(params, cfg, threshold=meta.get("threshold", 0.0))


class SimilarityGrader:
    """Bi-encoder threshold grader — the shipping default grade_fn.

    Measured on the held-out paraphrase set (benchmarks/grader_eval.py):
    at 160-pair training scale the from-scratch cross-encoder memorizes
    (held-out AUC 0.53) while embedding similarity generalizes — trained
    bi-encoder AUC 0.92 (acc 0.83 @ threshold 0.3), hybrid lexical+trained
    embedder AUC 0.95 (acc 0.91 @ threshold 0.2) — so the CLI grades with
    embedding similarity whenever a semantic embedder is available and
    reserves the cross-encoder for checkpoints trained at real data scale.
    Satisfies the graph's ``grade_fn(question, doc_texts) -> bool`` plug
    point (graph/nodes.py:121), same contract as the reference's yes/no
    LLM grade (core/utils.py:64-72)."""

    def __init__(self, embedder, threshold: float = 0.3):
        self.embedder = embedder          # TextEmbedder-like: texts -> [n,d]
        self.threshold = threshold

    def __call__(self, question: str, doc_texts: list[str]) -> bool:
        if not doc_texts:
            return False
        embs = np.asarray(self.embedder([question] + list(doc_texts)))
        return bool((embs[1:] @ embs[0]).max() >= self.threshold)


def score_pairs(params: dict, cfg: EmbedderConfig, queries, docs,
                batch: int = 32) -> np.ndarray:
    """Raw relevance logits for (query, doc) pairs -> [n] f32 (the
    threshold-free form of the grader; benchmarks/grader_eval.py measures
    accuracy/AUC on the held-out set with it)."""
    tok = HashCharTokenizer(cfg.vocab_size, cfg.max_len)
    ce = CrossEncoder(cfg)
    apply_jit = jax.jit(ce.apply)
    out = []
    for i in range(0, len(queries), batch):
        ids, mask, seg = encode_pairs(
            tok, list(queries[i:i + batch]), list(docs[i:i + batch]))
        out.append(np.asarray(apply_jit(
            params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(seg))))
    return np.concatenate(out) if out else np.zeros((0,), np.float32)


def make_grader(params: dict, tok: HashCharTokenizer, cfg: EmbedderConfig,
                *, threshold: float = 0.0):
    """Adapt a trained cross-encoder to the graph's ``grade_fn`` plug point
    (``grade_fn(question, doc_texts) -> bool``): relevant iff any graded
    doc's logit clears the threshold."""
    ce = CrossEncoder(cfg)
    apply_jit = jax.jit(ce.apply)

    def grade(question: str, doc_texts: list[str]) -> bool:
        if not doc_texts:
            return False
        ids, mask, seg = encode_pairs(
            tok, [question] * len(doc_texts), list(doc_texts))
        logits = apply_jit(params, jnp.asarray(ids), jnp.asarray(mask),
                           jnp.asarray(seg))
        return bool(np.max(np.asarray(logits)) >= threshold)

    return grade
