"""Continuous-batching LLM serving engine.

The reference's chat inference was Ollama (reference medical_engine.py:46)
— a daemon that queues whole requests one at a time per model. Production
LLM serving (vLLM, TGI, Ollama's own batch mode) interleaves many requests
through one decode loop so a new arrival never waits for someone else's
500-token generation to finish. This is that engine, rebuilt TPU-static:

- **Slot model.** The batch dimension is ``slots`` fixed serving lanes.
  Each lane is an independent request at its own cache position —
  ``Decoder.decode_step_slots`` (per-slot cursors) is the step primitive.
  Admission = prefill the prompt, scatter its K/V into the lane's row.
- **Chunked scheduling.** The axon relay charges ~30-100 ms per host round
  trip, so per-token host scheduling would cap throughput at ~10-30 tok/s
  regardless of model size. Instead the jitted program decodes ``chunk``
  steps for all lanes per dispatch (early-exiting if every lane finishes),
  and the host only schedules at chunk boundaries: admit arrivals, harvest
  EOS/overflow completions, resolve futures.
- **Static shapes everywhere.** One compiled chunk program per (slots,
  chunk); one prefill program per bucketed prompt length. Arrivals and
  departures change only the ``active`` mask — a traced VALUE, so no
  recompile, exactly the bucketing discipline of models/generate.py.
- **In-place cache.** The serving state (K/V cache + cursors + carried
  logits) is donated to both programs, so the multi-GB cache of a 7B-class
  model updates in place instead of copying every chunk.

Determinism notes:
- temperature>0 tokens depend on which chunk RNG rows the request happened
  to occupy — not reproducible across interleavings (greedy is). Same
  trade every continuous-batching server makes.
- greedy output is bit-identical to the lockstep ``Generator.generate``
  path at the same batch shape (asserted on real TPU), and independent of
  WHO shares the batch (row-wise matmuls can't mix lanes). It may differ
  from a DIFFERENT batch shape's output on TPU: bf16 matmul passes round
  differently per shape, which flips near-ties — the standard batched-vs-
  unbatched divergence every serving stack exhibits.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mediquery_rag_tpu.models.generate import Generator, _round_up


class ServeState(NamedTuple):
    """Device-resident serving state. ``logits`` carries each lane's
    next-token distribution across chunk boundaries (the token after a
    prefill comes from the prefill's own last-position logits)."""

    k: jax.Array          # [L, B, KH, C, dh]
    v: jax.Array
    key_mask: jax.Array   # [B, C] f32
    cursor: jax.Array     # [B] i32 — per-slot next write column
    next_pos: jax.Array   # [B] i32 — per-slot RoPE position
    logits: jax.Array     # [B, V] f32


@dataclass
class _Request:
    prompt: str
    max_new: int
    temperature: float
    future: Future
    tokens: list = field(default_factory=list)


class LLMServer:
    """Continuous-batching server over a ``Generator``'s model/params.

    >>> srv = LLMServer(generator, slots=4)
    >>> fut = srv.submit("prompt", max_new_tokens=64)
    >>> text = fut.result()
    """

    def __init__(self, generator: Generator, *, slots: int = 4,
                 chunk: int = 32, cache_len: int | None = None,
                 max_wait_ms: float = 2.0, seed: int = 0):
        self.gen = generator
        cfg = generator.cfg
        self.model = generator.model
        self.tok = generator.tokenizer
        self.B = slots
        self.T = chunk
        self.C = cache_len or cfg.max_len
        if self.C > cfg.max_len:
            raise ValueError(f"cache_len {self.C} > model max_len {cfg.max_len}")
        self.max_wait = max_wait_ms / 1e3
        self._rng = jax.random.PRNGKey(seed)
        self._eos = int(self.tok.eos_id)
        self._pad = int(self.tok.pad_id)

        L, D = cfg.layers, cfg.hidden
        kvh = cfg.kv_heads or cfg.heads
        dh = D // cfg.heads
        adt = jnp.dtype(cfg.dtype)
        B, C, V = self.B, self.C, cfg.vocab_size

        def _empty() -> ServeState:
            return ServeState(
                k=jnp.zeros((L, B, kvh, C, dh), adt),
                v=jnp.zeros((L, B, kvh, C, dh), adt),
                key_mask=jnp.zeros((B, C), jnp.float32),
                cursor=jnp.zeros((B,), jnp.int32),
                next_pos=jnp.zeros((B,), jnp.int32),
                logits=jnp.zeros((B, V), jnp.float32),
            )

        self.state = jax.jit(_empty)()

        model, pad_id, eos_id = self.model, self._pad, self._eos
        T = self.T
        from mediquery_rag_tpu.models.decoder import KVCache

        def _as_kv(state: ServeState) -> KVCache:
            return KVCache(k=state.k, v=state.v, key_mask=state.key_mask,
                           cursor=state.cursor, next_pos=state.next_pos)

        @partial(jax.jit, donate_argnums=(1,))
        def decode_chunk(params, state, active, temps, rng):
            """T decode steps for all lanes; returns (state, tokens [B, T]).
            Early-exits once every active lane has emitted EOS this chunk
            (or none are active) — the remaining columns hold pad."""

            def pick(logits, r, temps):
                greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                t = jnp.maximum(temps, 1e-6)
                sampled = jax.random.categorical(
                    r, logits / t[:, None]).astype(jnp.int32)
                return jnp.where(temps > 0.0, sampled, greedy)

            out0 = jnp.full((B, T), pad_id, jnp.int32)
            live0 = active

            def cond(carry):
                _, _, live, t = carry
                return (t < T) & live.any()

            def body(carry):
                state, out, live, t = carry
                r = jax.random.fold_in(rng, t)
                tok = pick(state.logits, r, temps)
                tok = jnp.where(live, tok, pad_id)
                out = jax.lax.dynamic_update_slice(out, tok[:, None], (0, t))
                logits, cache = model.decode_step_slots(
                    params, _as_kv(state), tok, live)
                live = live & (tok != eos_id)
                state = ServeState(cache.k, cache.v, cache.key_mask,
                                   cache.cursor, cache.next_pos, logits)
                return state, out, live, t + 1

            state, out, _, _ = jax.lax.while_loop(
                cond, body, (state, out0, live0, jnp.int32(0)))
            return state, out

        self._decode_chunk = decode_chunk
        self._admit_cache: dict = {}

        # host-side bookkeeping
        self._slots: list[_Request | None] = [None] * self.B
        self._queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self.stats = {"requests": 0, "chunks": 0, "prefills": 0,
                      "tokens_out": 0}
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # -- client API ----------------------------------------------------------

    def submit(self, prompt: str, *, max_new_tokens: int = 256,
               temperature: float = 0.0) -> Future:
        fut: Future = Future()
        self._queue.put(_Request(prompt, max_new_tokens, temperature, fut))
        return fut

    def complete(self, prompt: str, *, max_new_tokens: int = 256,
                 temperature: float = 0.0, timeout: float = 600.0) -> str:
        return self.submit(prompt, max_new_tokens=max_new_tokens,
                           temperature=temperature).result(timeout=timeout)

    def complete_batch(self, prompts: Sequence[str], **kw) -> list[str]:
        timeout = kw.pop("timeout", 600.0)
        futs = [self.submit(p, **kw) for p in prompts]
        return [f.result(timeout=timeout) for f in futs]

    def close(self) -> None:
        self._stop.set()
        self._worker.join(timeout=30.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- scheduler loop ------------------------------------------------------

    def _admit_program(self, S: int):
        """Prefill-into-slot program for bucketed prompt length S (cached
        per S — arrivals at the same bucket reuse it)."""
        fn = self._admit_cache.get(S)
        if fn is not None:
            return fn
        model, C = self.model, self.C

        @partial(jax.jit, donate_argnums=(1,))
        def admit(params, state, ids, mask, slot):
            logits, kv = model.prefill(params, ids, mask, C)
            return ServeState(
                k=state.k.at[:, slot].set(kv.k[:, 0]),
                v=state.v.at[:, slot].set(kv.v[:, 0]),
                key_mask=state.key_mask.at[slot].set(kv.key_mask[0]),
                cursor=state.cursor.at[slot].set(kv.cursor),
                next_pos=state.next_pos.at[slot].set(kv.next_pos[0]),
                logits=state.logits.at[slot].set(logits[0]),
            )

        self._admit_cache[S] = admit
        return admit

    def _try_admit(self, req: _Request, slot: int) -> bool:
        ids, mask = self.tok.batch_encode([req.prompt])
        S = ids.shape[1]
        if S >= self.C:          # keep the tail — standard chat truncation
            keep = _round_up(self.C - 128, 128)
            ids, mask = ids[:, -keep:], mask[:, -keep:]
            S = ids.shape[1]
        run = self._admit_program(S)
        self.state = run(self.gen.params, self.state, jnp.asarray(ids),
                         jnp.asarray(mask), jnp.int32(slot))
        self._slots[slot] = req
        self.stats["prefills"] += 1
        return True

    def _harvest(self, toks: np.ndarray) -> None:
        """Fold one chunk's tokens into per-slot transcripts; resolve
        futures for lanes that hit EOS, their token budget, or the cache
        end."""
        cursors = np.asarray(self.state.cursor)
        for b, req in enumerate(self._slots):
            if req is None:
                continue
            row = toks[b]
            done = False
            for t in row:
                t = int(t)
                if t == self._eos:
                    # a lane only goes inactive mid-chunk via EOS, so
                    # everything before the first EOS is real output (a
                    # sampled pad id is a legal token — decode() skips it)
                    done = True
                    break
                req.tokens.append(t)
                if len(req.tokens) >= req.max_new:
                    done = True
                    break
            if int(cursors[b]) >= self.C - 1:
                done = True          # cache exhausted: finish with what we have
            if done:
                self.stats["tokens_out"] += len(req.tokens)
                req.future.set_result(self.tok.decode(req.tokens))
                self._slots[b] = None

    def _loop(self) -> None:
        while not self._stop.is_set():
            # admit as many queued requests as there are free lanes
            admitted = False
            for b in range(self.B):
                if self._slots[b] is not None:
                    continue
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                self.stats["requests"] += 1
                self._try_admit(req, b)
                admitted = True

            active_h = [r is not None for r in self._slots]
            if not any(active_h):
                if not admitted:
                    try:
                        req = self._queue.get(timeout=0.05)
                    except queue.Empty:
                        continue
                    self.stats["requests"] += 1
                    self._try_admit(req, 0)
                continue

            self._rng, sub = jax.random.split(self._rng)
            temps = jnp.asarray(
                [r.temperature if r else 0.0 for r in self._slots],
                jnp.float32)
            self.state, toks = self._decode_chunk(
                self.gen.params, self.state,
                jnp.asarray(active_h), temps, sub)
            self.stats["chunks"] += 1
            self._harvest(np.asarray(toks))


class ServedLLMClient:
    """``LLMClient`` adapter over a shared ``LLMServer`` — many sessions,
    one TPU decode loop. Chat templating mirrors llm/tpu_client.py."""

    def __init__(self, server: LLMServer, *, max_new_tokens: int = 256,
                 temperature: float = 0.0, template: str = "plain"):
        self.server = server
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature
        self.template = template

    def complete(self, messages, **kw) -> str:
        from mediquery_rag_tpu.llm.tpu_client import render_chat, _cut_turn

        prompt = render_chat(messages, template=self.template)
        out = self.server.complete(
            prompt,
            max_new_tokens=kw.get("max_new_tokens", self.max_new_tokens),
            temperature=kw.get("temperature", self.temperature))
        return _cut_turn(out, self.template)
