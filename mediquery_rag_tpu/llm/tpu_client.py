"""TPULLMClient — the chat LLM served from the TPU itself.

Completes SURVEY §2b row 2: the reference's chat inference ran out-of-process
in Ollama's GGML C++ runtime (ChatOllama qwen2.5:7b, medical_engine.py:46);
here the same ``LLMClient`` seam is satisfied by an in-repo JAX decoder
(models/decoder.py) behind the batched KV-cache generation engine
(models/generate.py). Drop-in anywhere an ``HTTPChatClient`` goes —
AppContext, graph nodes, consultation — no HTTP daemon required.
"""

from __future__ import annotations

from typing import Sequence

from mediquery_rag_tpu.llm.messages import Message
from mediquery_rag_tpu.models.generate import Generator

# Plain-text role markers (the byte-level vocab has no reserved role tokens;
# markers are ordinary UTF-8 the model learns like any other bytes).
_ROLE = {"system": "<|system|>", "user": "<|user|>", "assistant": "<|assistant|>"}
_END = "<|end|>"


def render_chat(messages: Sequence[Message] | str, *,
                for_training: bool = False) -> str:
    """Messages -> the decoder's prompt string. Serving prompts end with an
    open assistant turn; training samples close it (EOS is appended by the
    tokenizer, so ``_END`` only terminates *inner* turns)."""
    from mediquery_rag_tpu.llm.client import _as_messages

    parts = []
    for m in _as_messages(messages):
        parts.append(f"{_ROLE.get(m.role, _ROLE['user'])}\n{m.content}{_END}")
    text = "".join(parts)
    if for_training:
        if not parts or _as_messages(messages)[-1].role != "assistant":
            raise ValueError("training samples must end with an assistant turn")
        return text.removesuffix(_END)  # tokenizer's EOS closes the turn
    return text + _ROLE["assistant"] + "\n"


class TPULLMClient:
    """``LLMClient`` implementation backed by the TPU decoder."""

    def __init__(self, generator: Generator, *, max_new_tokens: int = 256,
                 temperature: float = 0.0):
        self.generator = generator
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature

    def complete(self, messages: Sequence[Message] | str, **kw) -> str:
        return self.complete_batch([messages], **kw)[0]

    def complete_batch(self, message_lists, **kw) -> list[str]:
        """Batched completion — one TPU program for N conversations (the
        capability the reference's one-request-at-a-time HTTP client never
        had)."""
        prompts = [render_chat(m) for m in message_lists]
        outs = self.generator.generate(
            prompts,
            max_new_tokens=kw.get("max_new_tokens", self.max_new_tokens),
            temperature=kw.get("temperature", self.temperature),
        )
        cut = []
        for out in outs:
            # the model may imitate the template and open another turn; stop there
            for stop in (_END, *_ROLE.values()):
                idx = out.find(stop)
                if idx >= 0:
                    out = out[:idx]
            cut.append(out.strip())
        return cut

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "TPULLMClient":
        return cls(Generator.from_checkpoint(path), **kw)
