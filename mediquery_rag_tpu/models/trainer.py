"""Contrastive trainer: sharded InfoNCE fine-tuning of the embedder.

The reference consumed a frozen third-party embedding model; a standalone
framework must be able to *train* its retriever. In-batch-negative InfoNCE
over (query, doc) pairs is the standard recipe for dense retrievers.

Parallelism (SURVEY §2c mapping):
- DP: batch sharded over the ``data`` mesh axis;
- TP: Megatron column/row layout from ``Embedder.partition_specs`` over the
  ``model`` axis — XLA/GSPMD inserts the psums;
- the in-batch similarity matrix ``q @ d.T`` is computed on globally-gathered
  embeddings (they are tiny: [B, 768]), so the contrastive loss sees all
  negatives regardless of the data sharding;
- remat (jax.checkpoint) per transformer block trades FLOPs for HBM.

PP/EP are N/A for this model family (documented in SURVEY §2c); SP is
unnecessary at 512-token sequences but the ``data`` axis can be repurposed
for sequence sharding if long-context embedders land later.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mediquery_rag_tpu.config import EmbedderConfig, TrainConfig
from mediquery_rag_tpu.models.embedder import Embedder


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


class Batch(NamedTuple):
    q_ids: jax.Array    # [B, S]
    q_mask: jax.Array
    d_ids: jax.Array    # [B, S]
    d_mask: jax.Array


def info_nce_loss(q_emb, d_emb, temperature):
    """Bidirectional in-batch-negative InfoNCE. Embeddings L2-normalized."""
    logits = jnp.dot(q_emb, d_emb.T, preferred_element_type=jnp.float32)
    logits = logits / temperature
    labels = jnp.arange(logits.shape[0])
    l_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    l_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return 0.5 * (l_qd + l_dq)


class ContrastiveTrainer:
    def __init__(
        self,
        model_cfg: EmbedderConfig = EmbedderConfig(),
        train_cfg: TrainConfig = TrainConfig(),
        mesh: Mesh | None = None,
    ):
        self.model = Embedder(model_cfg)
        self.cfg = train_cfg
        self.mesh = mesh
        self.tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(
                optax.warmup_cosine_decay_schedule(
                    0.0, train_cfg.lr, train_cfg.warmup_steps, 10_000
                ),
                weight_decay=train_cfg.weight_decay,
            ),
        )
        self._jit_step = None

    def init_state(self, key: jax.Array) -> TrainState:
        params = self.model.init(key)
        if self.mesh is not None:
            pspecs = self.model.partition_specs()
            params = jax.tree_util.tree_map(
                lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
                params, pspecs,
            )
        opt_state = self.tx.init(params)  # moments inherit param shardings
        return TrainState(params, opt_state, jnp.int32(0))

    # -- the step ------------------------------------------------------------

    def _loss_fn(self, params, batch: Batch):
        q = self.model.apply(params, batch.q_ids, batch.q_mask, remat=self.cfg.remat)
        d = self.model.apply(params, batch.d_ids, batch.d_mask, remat=self.cfg.remat)
        return info_nce_loss(q, d, self.cfg.temperature)

    def train_step(self, state: TrainState, batch: Batch):
        """One update. Returns (new_state, metrics). Jitted + cached."""
        if self._jit_step is None:
            def step(state, batch):
                loss, grads = jax.value_and_grad(self._loss_fn)(state.params, batch)
                updates, opt_state = self.tx.update(
                    grads, state.opt_state, state.params
                )
                params = optax.apply_updates(state.params, updates)
                gnorm = optax.global_norm(grads)
                return (
                    TrainState(params, opt_state, state.step + 1),
                    {"loss": loss, "grad_norm": gnorm},
                )

            if self.mesh is not None:
                batch_sh = NamedSharding(self.mesh, P("data", None))
                self._jit_step = jax.jit(
                    step,
                    in_shardings=(None, Batch(batch_sh, batch_sh, batch_sh, batch_sh)),
                )
            else:
                self._jit_step = jax.jit(step)
        return self._jit_step(state, batch)
